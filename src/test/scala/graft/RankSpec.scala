package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Rank

/** The distributed two-level scan must be BIT-IDENTICAL to the
  * single-partition window forms it replaces — parity is asserted
  * against ntile()/row_number()/running-sum on the same data, ties
  * included (duplicated measures with unique key tie-breaks). */
class RankSpec extends SparkTestBase {
  import spark.implicits._

  private def sample = (1 to 97).map { i =>
    (i.toLong, ((i * 37) % 11).toLong) // many ties in m, unique id
  }.toDF("id", "m")

  test("rankedCumSum matches the global window rank and running sum") {
    val got = Rank.rankedCumSum(sample, expr("m DIV 3"),
        Seq(col("m"), col("id")), col("m"))
      .select("id", "rk", "cum")
    val w = Window.orderBy(col("m"), col("id"))
    val want = sample.select(col("id"),
      row_number().over(w).cast("long").as("rk"),
      sum("m").over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("cum"))
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("rankedCumSum with a descending leading key (the pareto shape)") {
    val got = Rank.rankedCumSum(sample, -expr("m DIV 3"),
        Seq(col("m").desc, col("id")), col("m"))
      .select("id", "rk", "cum")
    val w = Window.orderBy(col("m").desc, col("id"))
    val want = sample.select(col("id"),
      row_number().over(w).cast("long").as("rk"),
      sum("m").over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("cum"))
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("ntileExact matches ntile() for every b, including ragged tails") {
    for (b <- Seq(2, 5, 8)) {
      val got = Rank.ntileExact(sample, expr("m DIV 3"),
        Seq(col("m"), col("id")), b, "tile").select("id", "tile")
      val want = sample.select(col("id"),
        ntile(b).over(Window.orderBy(col("m"), col("id"))).cast("long").as("tile"))
      assert(got.except(want).count() == 0 && want.except(got).count() == 0,
        s"ntile($b) parity failed")
    }
  }

  test("no unpartitioned window anywhere in the plan") {
    val df = Rank.ntileExact(sample, expr("m DIV 3"),
      Seq(col("m"), col("id")), 5, "tile")
    df.collect()
    import org.apache.spark.sql.execution.window.WindowExec
    val bad = flattenPlan(df.queryExecution.executedPlan)
      .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty, s"found unpartitioned window(s):\n${bad.headOption}")
  }
}
