package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query twice and reports
  * cold (first run: includes the one-time plan/codegen compile) and warm
  * (second run: data-dependent cost only) seconds. The headline `value`
  * stays the cold total — the number the driver tracks — with
  * `warm`/`warm_total` alongside so plan-compile constants are
  * separable from real data costs (they amortize to noise at cluster
  * scale; warm is the 100 TB-relevant number). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // 200 queries × 2 runs in one driver JVM: broadcast/shuffle state
      // is reclaimed by the ContextCleaner only when a GC actually runs,
      // and the default periodicGC interval (30 min) never fires inside
      // a bench — tighten it so late-suite queries aren't taxed by the
      // accumulated heap of the first hundred
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/FS once so the first timed query doesn't carry
    // the whole session bootstrap cost
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // a failed query must be visible, not a fast-looking timing: report
      // -1 and log, instead of silently recording time-to-crash
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // release the query's tracked intermediates (the library-user
      // discipline), with clearCache as a backstop for anything else
      Caches.release()
      spark.catalog.clearCache()
      dt
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((name, fn), i) =>
        // untimed GC hint every 25 queries: lets the ContextCleaner drop
        // dead broadcasts/accumulators so heap pressure stays flat across
        // the suite instead of inflating the tail's timings
        if (i % 25 == 24) System.gc()
        (name, timeOne(name, fn), timeOne(name, fn))
    }
    def dict(f: ((String, Double, Double)) => Double): String =
      results.map(r => s"\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val warmTotal = results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${dict(_._2)},"warm":${dict(_._3)},"warm_total":$warmTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
