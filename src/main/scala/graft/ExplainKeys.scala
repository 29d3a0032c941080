package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Optimization-round evidence capture: write `.explain("formatted")`
  * for each named query to `<outDir>/<key>.txt`.
  * `runMain graft.ExplainKeys <sfDir> <outDir> <key> [key ...]`
  * (Iterative-loop operators materialize eagerly at construction; the
  * dump then shows the final readout plan — the per-round shape is
  * spec'd/profiled instead, as PlanAudit documents.)
  */
object ExplainKeys {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val keys = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", Sessions.openCostInBytes)
      .config("spark.sql.adaptive.enabled", Sessions.adaptiveEnabled)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(out))
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(out, s"$k.txt"), plan)
      println(s"[explain] wrote $out/$k.txt (${plan.length} chars)")
      Caches.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
