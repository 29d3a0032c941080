package graft

import org.apache.spark.sql.SparkSession

/** Scale-probe main for the `maxDf`-capped containment path
  * (Dedup.containmentPairs, the documented 100 TB hot-gram mitigation):
  * runs capped — and optionally exact — containment over a corpus dir
  * and prints one JSON line per leg with elapsed seconds and the pair
  * count, so the r13 probe can show the cap tames the boilerplate-gram
  * Σdf² blowup that OOM'd the exact path on the salted x300 corpus
  * (r11), and quantify the one-sided recall trade on a corpus where
  * exact IS computable (x1).
  *
  * Usage: ProbeCappedContainment <sfDir> <maxDf|exact> [threshold]
  */
object ProbeCappedContainment {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProbeCappedContainment <sfDir> <maxDf|exact> [threshold]")
    val dir = args(0)
    val cap = if (args(1) == "exact") None else Some(args(1).toLong)
    val threshold = if (args.length > 2) args(2).toDouble else 0.6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.files.openCostInBytes", Sessions.openCostInBytes)
      .config("spark.sql.adaptive.enabled", Sessions.adaptiveEnabled)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def leg(label: String): Unit = {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.containmentPairs(
        Tables.t(spark, dir, "documents"), threshold = threshold, maxDf = cap)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      Caches.release()
      println(f"""{"probe":"containment","leg":"$label","dir":"$dir","maxDf":${
        cap.getOrElse(-1L)},"threshold":$threshold,"pairs":$n,"sec":$sec%.2f}""")
    }
    leg("cold"); leg("warm")
    spark.stop()
  }
}
