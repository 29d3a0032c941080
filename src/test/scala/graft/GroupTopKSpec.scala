package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.{GroupTopK, GroupTopKExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

class GroupTopKSpec extends SparkTestBase {
  import spark.implicits._

  test("GroupTopK matches the window row_number formulation exactly") {
    val ev = Tables.t(spark, sfDir, "events").select("user_id", "event_id", "value")
    val got = GroupTopK.topK(
        ev, Seq("user_id"), Seq("value" -> true, "event_id" -> false), 3)
      .orderBy(col("user_id"), col("value").desc, col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val want = ev.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .orderBy(col("user_id"), col("value").desc, col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("plan has partial+final heaps around ONE exchange; partial prunes the shuffle") {
    // 100k rows, 50 groups: the partial stage may emit at most
    // parts * groups * k candidate rows into the exchange
    val d = spark.range(0, 100000, 1, 8)
      .selectExpr("id % 50 AS g", "id AS uid", "CAST(xxhash64(id) AS DOUBLE) AS v")
    val df = GroupTopK.topK(d, Seq("g"), Seq("v" -> true, "uid" -> false), 5)
    val rows = df.collect()
    assert(rows.length == 50 * 5)
    val nodes = flattenPlan(df.queryExecution.executedPlan)
    val topks = nodes.collect { case t: GroupTopKExec => t }
    assert(topks.map(_.partial).sorted == Seq(false, true),
      s"expected one partial and one final GroupTopKExec, got $topks")
    val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size == 1, s"expected exactly one exchange, got ${shuffles.size}")
    val partialOut = topks.find(_.partial).get.metrics("numOutputRows").value
    assert(partialOut <= 8L * 50 * 5,
      s"partial stage must bound the shuffle: emitted $partialOut of 100000")
    assert(partialOut < 100000L / 10,
      s"partial stage should prune >90% here, emitted $partialOut")
  }

  test("ties at the boundary resolve by the tie-break column") {
    val d = Seq(
      ("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0), ("a", 4L, 1.0),
      ("b", 9L, 2.0)).toDF("g", "id", "v")
    val got = GroupTopK.topK(d, Seq("g"), Seq("v" -> true, "id" -> false), 2)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // group a: three v=5.0 ties -> ids 1,2 win on the ascending tie-break
    assert(got == Seq(("a", 1L), ("a", 2L), ("b", 9L)))
  }

  test("k larger than the group passes everything through") {
    val d = Seq(("a", 1L, 1.0), ("a", 2L, 2.0)).toDF("g", "id", "v")
    val got = GroupTopK.topK(d, Seq("g"), Seq("v" -> true, "id" -> false), 10)
      .collect()
    assert(got.length == 2)
  }
}
