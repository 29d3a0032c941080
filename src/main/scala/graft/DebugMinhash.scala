package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Stage-by-stage timing for the minhash pipeline (scratch tool). */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("DBG_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("DBG_PARTS", "8"))
      .config("spark.sql.files.openCostInBytes", Sessions.openCostInBytes)
      .config("spark.sql.adaptive.enabled", Sessions.adaptiveEnabled)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.t(spark, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("docs count")(docs.count())
    val sigs = Dedup.minhashSignatures(docs)
    time("signatures")(sigs.count())
    val cands = Dedup.minhashCandidates(docs)
    time("candidates full")(println("pairs=" + cands.count()))
    spark.stop()
  }
}
