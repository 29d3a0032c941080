package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bucketing, Skew}

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin result identical to a plain join on a skewed key") {
    // 90% of rows on one hot key
    val big = (1L to 1000L).map(i => (if (i <= 900) 1L else i, i)).toDF("k", "payload")
    val small = Seq((1L, "hot"), (950L, "cold"), (999L, "cold")).toDF("k", "label")
    val plain = big.join(small, "k").select("k", "payload", "label")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == 1L) == 900)
  }

  test("keySkew surfaces the hot key with its share") {
    val big = (1L to 1000L).map(i => (if (i <= 900) 1L else i, i)).toDF("k", "payload")
    val top = Skew.keySkew(big, "k", 3).collect()
    assert(top.head.getLong(0) == 1L)
    assert(top.head.getLong(1) == 900L)
    assert(top.head.getDouble(2) == 0.9)
  }

  test("co-bucketed join plans with zero shuffles") {
    val li = Tables.t(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.t(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "b_orders", "l_orderkey", 8)
    val joined = Bucketing.coBucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected exchange-free bucketed join, got:\n$plan")
    assert(joined.count() == li.count()) // every lineitem row has its order
  }
}
