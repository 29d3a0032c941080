package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name cold: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name warm: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
