package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.FrequentAgg
import graft.operators.TextOps

class FrequentSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(terms: Seq[String], capacity: Int, parts: Int = 4) = {
    val row = terms.toDF("term").repartition(parts)
      .agg(FrequentAgg.frequentSketch(col("term"), capacity))
      .head().getStruct(0)
    val items = row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    (items, row.getLong(1))
  }

  test("coPurchase: planted baskets give the analytic lift; repeats collapse") {
    // o1:{X,Y} (X twice -> one basket membership), o2:{X,Y}, o3:{X},
    // o4:{Y}, o5:{Z}
    val li = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (4L, 2L), (5L, 3L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y"), (3L, "Z")).toDF("p_partkey", "p_brand")
    val out = graft.operators.Basket.coPurchase(li, part, minSupport = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // lift(X,Y) = (2/5) / ((3/5)*(3/5)) = 10/9 -> 1.1111
    assert(out.toSeq == Seq(("X", "Y", 2L, 1.1111)))
  }

  test("rfm: quintile scores follow the constructed R/F/M ordering into segments") {
    // cust k (1..5): k orders, each 2k dollars, last order 2024-01-0k →
    // r = f = m = k exactly (5 customers, one per quintile, all three
    // orderings aligned). 5:(5,5,5) and 4:(4,4,4) → champion;
    // 3:(3,3,3) → other; 2 and 1 → hibernating.
    val rows = for { k <- 1 to 5; _ <- 1 to k }
      yield (k.toLong, s"2024-01-0$k 00:00:00", 2.0 * k)
    val orders = rows.toDF("o_custkey", "d_s", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("d_s"))).drop("d_s")
    val out = graft.operators.Basket.rfmSegments(orders).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // champions: custs 4,5 → recency (1+0)/2, orders (4+5)/2, 32+50 dollars
    assert(out("1_champion") == ((2L, 0.5, 4.5, 82.0)))
    assert(out("6_other") == ((1L, 2.0, 3.0, 18.0)))
    assert(out("5_hibernating") == ((2L, 3.5, 1.5, 10.0)))
    assert(out.size == 3)
  }

  test("sketch is exact when cardinality fits the capacity") {
    val stream = Seq.fill(30)("a") ++ Seq.fill(11)("b") ++ Seq.fill(2)("c")
    val (items, debt) = sketch(scala.util.Random.shuffle(stream), capacity = 16)
    assert(debt == 0L)
    assert(items == Map("a" -> 30L, "b" -> 11L, "c" -> 2L))
  }

  test("heavy items survive eviction and merges with a valid error bound") {
    // 400 hot occurrences vs 600 singletons through capacity-16 sketches
    // merged across 8 partitions
    val stream = Seq.fill(400)("hot") ++ (0 until 600).map(i => s"cold$i")
    val (items, debt) = sketch(scala.util.Random.shuffle(stream), 16, parts = 8)
    assert(items.contains("hot"), s"hot item evicted: $items debt=$debt")
    val est = items("hot")
    // MG invariant: underestimate, within debt of the truth
    assert(est <= 400L && est + debt >= 400L, s"est=$est debt=$debt")
    // an untracked term's true count must be <= debt (all colds are 1)
    assert(debt >= 1L || items.size == 601)
  }

  test("heavyHitters equals the exact top-k when the guarantee holds") {
    val docs = (0 until 200).map { i =>
      // zipf-ish: "alpha" everywhere, "beta" half, "gamma" quarter, noise
      val parts = Seq("alpha") ++
        (if (i % 2 == 0) Seq("beta") else Nil) ++
        (if (i % 4 == 0) Seq("gamma") else Nil) ++ Seq(s"noise$i")
      (i.toLong, parts.mkString(" "))
    }.toDF("doc_id", "text")
    val got = TextOps.heavyHitters(docs, k = 3, capacity = 64).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("alpha", 200L), ("beta", 100L), ("gamma", 50L)))
  }

  test("heavyHitters refuses an unverifiable answer on flat data") {
    val docs = (0 until 5000).map(i => (i.toLong, s"only$i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.heavyHitters(docs, k = 2, capacity = 8)
    }
    assert(e.getMessage.contains("guarantee not met"))
  }
}
