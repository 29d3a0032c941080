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

  test("assocRules: directional confidence/lift/conviction replay the hand computation") {
    // baskets o1:{X,Y}, o2:{X,Y}, o3:{X}, o4:{Y}, o5:{Z} (coPurchase's
    // fixture): X→Y support 2, conf 2/3, P(Y) 3/5 → lift 10/9 = 1.1111,
    // conviction (1−0.6)/(1−2/3) = 1.2 — and symmetrically for Y→X
    val li = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (4L, 2L), (5L, 3L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y"), (3L, "Z")).toDF("p_partkey", "p_brand")
    val out = graft.operators.Basket.assocRules(li, part, minSupport = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("X", "Y", 2L, 0.6667, 1.1111, 1.2),
      ("Y", "X", 2L, 0.6667, 1.1111, 1.2)))
  }

  test("fpGrowth: itemset counts agree with the exact pair/triple algebra") {
    // baskets o1,o2: {X,Y,Z}; o3: {X,Y}; o4: {X} (the triples fixture)
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (4L, 1L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y"), (3L, "Z")).toDF("p_partkey", "p_brand")
    val out = graft.operators.Topics.fpGrowth(li, part, minSupport = 0.5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // support >= 2 of 4 baskets: X:4 Y:3 Z:2, XY:3 XZ:2 YZ:2, XYZ:2
    assert(out == Seq(
      ("X", 1L, 4L), ("Y", 1L, 3L), ("Z", 1L, 2L),
      ("X,Y", 2L, 3L), ("X,Z", 2L, 2L), ("Y,Z", 2L, 2L),
      ("X,Y,Z", 3L, 2L)))
  }

  test("cohortLtv: cumulative per-customer revenue by cohort age, exact cents") {
    // cohort 2024-01 = {c1, c2}: age0 rev $40 → ltv 20.00, age1 +$20 →
    // cum $60, ltv 30.00; cohort 2024-02 = {c3}: $5 → ltv 5.00
    val orders = Seq(
      (1L, "2024-01-05 00:00:00", 10.0), (1L, "2024-02-10 00:00:00", 20.0),
      (2L, "2024-01-20 00:00:00", 30.0), (3L, "2024-02-01 00:00:00", 5.0))
      .toDF("o_custkey", "d_s", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("d_s"))).drop("d_s")
    val out = graft.operators.Basket.cohortLtv(orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2024-01", 0L, 2L, 4000L, 20.0), ("2024-01", 1L, 2L, 6000L, 30.0),
      ("2024-02", 0L, 1L, 500L, 5.0)))
  }

  test("frequentTriples: the planted triple surfaces once with analytic lift3") {
    // o1,o2: {X,Y,Z}; o3: {X,Y}; o4: {X} → triple (X,Y,Z) support 2,
    // n=4, cX=4 cY=3 cZ=2: lift3 = (2/4)/((4/4)(3/4)(2/4)) = 4/3 → 1.3333
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (4L, 1L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y"), (3L, "Z")).toDF("p_partkey", "p_brand")
    val out = graft.operators.Basket.frequentTriples(li, part, minSupport = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(("X", "Y", "Z", 2L, 1.3333)))
  }

  test("assocRules: an exact rule (conf = 1) reports NULL conviction") {
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y")).toDF("p_partkey", "p_brand")
    val out = graft.operators.Basket.assocRules(li, part, minSupport = 1).collect()
    assert(out.length == 2 && out.forall(r => r.getDouble(3) == 1.0 && r.isNullAt(5)))
  }

  test("skyline: planted domination cases resolve across and within price buckets") {
    // cents: 1:(10,500) 2:(20,500) 3:(20,400) 4:(30,600) 5:(30,600)
    //        6:(5,300) 7:(4,350) | bucket 1: 8:(50,12000) 9:(25,13000)
    // 1 ← dominated by 2 (same price, larger); 2 ← by 3 (cheaper, equal
    // size); 7 ← by 6; 9 ← by 4 ACROSS the bucket boundary (prefix-max
    // path); 4 and 5 are exact duplicates — strict domination keeps both.
    val parts = Seq(
      (1L, 10, 5.00), (2L, 20, 5.00), (3L, 20, 4.00),
      (4L, 30, 6.00), (5L, 30, 6.00), (6L, 5, 3.00), (7L, 4, 3.50),
      (8L, 50, 120.00), (9L, 25, 130.00)
    ).toDF("p_partkey", "p_size", "p_retailprice")
    val out = graft.operators.Basket.skyline(parts).collect().map(_.getLong(0)).toSet
    assert(out == Set(3L, 4L, 5L, 6L, 8L))
  }

  test("itemCf: cosine neighbors replay the hand-computed matrix; repeat purchases collapse") {
    // customers c1:{X,Y} (Y twice via o5), c2:{X,Y}, c3:{X}, c4:{Y,Z}
    // n(X)=3 n(Y)=3 n(Z)=1; co(X,Y)=2, co(Y,Z)=1
    val orders = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 1L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L),
      (4L, 3L), (4L, 2L), (5L, 2L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "X"), (2L, "Y"), (3L, "Z")).toDF("p_partkey", "p_brand")
    val out = graft.operators.Basket.itemCf(li, orders, part, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // cos(X,Y) = 2/3 → 0.6667; cos(Y,Z) = 1/√3 → 0.5774
    assert(out.toSeq == Seq(
      ("X", "Y", 2L, 0.6667, 1L),
      ("Y", "X", 2L, 0.6667, 1L), ("Y", "Z", 1L, 0.5774, 2L),
      ("Z", "Y", 1L, 0.5774, 1L)))
  }

  test("equidepth: tiles are exact NTILE groups — sizes within 1, cover the table, ordered bounds") {
    val out = graft.queries.Relational.q34Equidepth(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 8L))
    val sizes = out.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    val total = graft.Tables.t(spark, sfDir, "lineitem").count()
    assert(sizes.sum == total)
    // equal-row NTILE means earlier tiles are the bigger ones
    assert(sizes.sameElements(sizes.sortBy(-_)))
    // value ranges are non-overlapping and ascending (ties may touch)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2), s"tile ${a.getLong(0)} hi > next lo")
    }
  }

  test("giniByGroup: equality gives 0, total concentration approaches 1 - n ties broken") {
    import graft.operators.Basket
    // group e: four equal values → G = 0 exactly
    // group c: {0,0,0,100} → G = 2·(4·100)/(4·100) − 5/4 = 0.75
    val rows = Seq(("e", 10.0, 1L), ("e", 10.0, 2L), ("e", 10.0, 3L), ("e", 10.0, 4L),
      ("c", 0.0, 5L), ("c", 0.0, 6L), ("c", 0.0, 7L), ("c", 100.0, 8L))
    val out = Basket.giniByGroup(rows.toDF("g", "v", "k"), "g", "v", "k")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("e") == 0.0 && out("c") == 0.75)
  }

  test("priceElasticity: a planted q = c/p relation regresses to exactly -1") {
    import graft.operators.Basket
    // qty = 100/price → ln(qty) = ln(100) − ln(unit price), slope −1, r −1
    val li = (1 to 20).map { i =>
      val p = i.toDouble          // unit price
      val q = 100.0 / p           // demanded quantity
      (i.toLong, q, p * q)        // extendedprice = unit price × qty
    }.toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = (1 to 20).map(i => (i.toLong, "B1")).toDF("p_partkey", "p_brand")
    val r = Basket.priceElasticity(li, part).head()
    assert((r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      (("B1", 20L, -1.0, -1.0)))
  }

  test("prefixSpan: planted ordered journeys mine with exact supports") {
    import graft.operators.Topics
    // users 1-3 follow a>b>c in time order; user 4 does c>b>a (reversed
    // — supports a, b, c singletons but NOT the forward bigrams)
    def journey(u: Long, types: Seq[String]) = types.zipWithIndex.map {
      case (t, i) => (u * 100 + i, u, s"2024-03-01 10:0$i:00", t)
    }
    val ev = (journey(1, Seq("a", "b", "c")) ++ journey(2, Seq("a", "b", "c")) ++
        journey(3, Seq("a", "b", "c")) ++ journey(4, Seq("c", "b", "a")))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Topics.prefixSpan(ev, minSupport = 0.5, maxPatternLength = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("a") == 4L && out("b") == 4L && out("c") == 4L)
    assert(out("a>b") == 3L && out("b>c") == 3L && out("a>b>c") == 3L)
    assert(!out.contains("c>a"), "reverse-order pair is below 0.5 support")
  }

  test("substitutes: never-co-bought pairs rank first with lift 0") {
    import graft.operators.Basket
    val li = Seq(
      (1L, 5L), (1L, 10L), (2L, 5L), (2L, 10L), // 5+10 together twice
      (3L, 5L), (3L, 15L), (4L, 10L), (4L, 15L),
      (5L, 20L)) // 20 never co-bought with anything
      .toDF("l_orderkey", "l_partkey")
    val out = Basket.substitutes(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // n_orders = 5 (order 5 holds only the loner part 20)
    assert(out.toSeq == Seq(
      (5L, 20L, 3L, 1L, 0L, 0.0), (10L, 20L, 3L, 1L, 0L, 0.0),
      (15L, 20L, 2L, 1L, 0L, 0.0),
      (5L, 15L, 3L, 2L, 1L, 0.8333), (10L, 15L, 3L, 2L, 1L, 0.8333),
      (5L, 10L, 3L, 3L, 2L, 1.1111)))
  }

  test("orderAging: buckets by age against the as-of date, open orders only") {
    import graft.operators.Basket
    import java.sql.Timestamp
    val orders = Seq(
      (1L, "O", Timestamp.valueOf("1998-08-02 00:00:00"), 10.0), // age 0
      (2L, "O", Timestamp.valueOf("1998-06-18 00:00:00"), 20.0), // age 45
      (3L, "O", Timestamp.valueOf("1998-04-24 00:00:00"), 40.0), // age 100
      (4L, "F", Timestamp.valueOf("1998-04-24 00:00:00"), 99.0)) // closed
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice")
    val out = Basket.orderAging(orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("0_00_30", 1L, 10.0), ("1_31_60", 1L, 20.0),
      ("3_90_plus", 1L, 40.0)))
  }

  test("supplierScorecard: one fold yields every metric for the hand case") {
    import graft.operators.Basket
    import java.sql.Timestamp
    val orders = Seq((1L, Timestamp.valueOf("1995-01-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, 1L, 7L, 100.0, 0.05, Timestamp.valueOf("1995-01-11 00:00:00")),
      (1L, 1L, 8L, 200.0, 0.15, Timestamp.valueOf("1995-02-10 00:00:00")),
      (1L, 2L, 9L, 50.0, 0.0, Timestamp.valueOf("1995-01-06 00:00:00")))
      .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice",
        "l_discount", "l_shipdate")
    val sup = Seq((1L, "S1"), (2L, "S2")).toDF("s_suppkey", "s_name")
    val out = Basket.supplierScorecard(li, orders, sup).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq == Seq(
      (1L, "S1", 300.0, 2L, 2L, 0.1, 0.5), // lag 10 ok, lag 40 late
      (2L, "S2", 50.0, 1L, 1L, 0.0, 0.0)))
  }

  test("basketSize: histogram buckets by exact line counts") {
    import graft.operators.Basket
    val li = Seq((1L, 1), (2L, 1), (2L, 2), (3L, 1), (3L, 2))
      .map { case (o, l) => (o, l) }
      .toDF("l_orderkey", "l_linenumber")
    val orders = Seq((1L, 10.0), (2L, 20.0), (3L, 40.0))
      .toDF("o_orderkey", "o_totalprice")
    val out = Basket.basketSize(li, orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 1L, 10.0), (2L, 2L, 30.0)))
  }

  test("abcXyz: planted 80/15/5 revenue with flat/wobbly/one-shot demand") {
    import graft.operators.Basket
    import java.sql.Timestamp
    val orders = Seq(
      (1L, Timestamp.valueOf("1995-01-10 00:00:00")),
      (2L, Timestamp.valueOf("1995-02-10 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, 1L, 10.0, 40.0), (2L, 1L, 10.0, 40.0), // A: cum 0.80, cv 0 → X
      (1L, 2L, 1.0, 5.0), (2L, 2L, 3.0, 10.0),    // B: cum 0.95, cv .71 → Y
      (1L, 3L, 2.0, 5.0))                          // C: single month → Z
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val out = Basket.abcXyz(li, orders).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("A", "X", 1L, 80.0), ("B", "Y", 1L, 15.0),
      ("C", "Z", 1L, 5.0)))
  }

  test("trendByGroup: a planted linear ramp regresses to its exact slope") {
    import graft.operators.Basket
    import java.sql.Timestamp
    val orders = (1 to 3).map(m =>
      (m.toLong, Timestamp.valueOf(f"1995-0$m-15 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    // Grow: 100/200/300 per month → slope 100; Flat: 50/50/50 → slope 0
    val li = (1 to 3).flatMap(m => Seq(
      (m.toLong, 1L, 100.0 * m), (m.toLong, 2L, 50.0)))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice")
    val part = Seq((1L, "Grow"), (2L, "Flat")).toDF("p_partkey", "p_brand")
    val out = Basket.trendByGroup(li, orders, part).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("Grow", 3L, 100.0, 200.0),
      ("Flat", 3L, 0.0, 50.0)))
  }

  test("priceVolumeMix: the waterfall identity splits the revenue change") {
    import graft.operators.Basket
    import java.sql.Timestamp
    val orders = Seq(
      (1L, Timestamp.valueOf("1996-06-01 00:00:00")),
      (2L, Timestamp.valueOf("1997-06-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    // brand A: 1996 q=10 r=100 (p=10) → 1997 q=20 r=300 (p=15):
    // volume (20−10)·10 = 100, price (15−10)·20 = 100, total 200
    val li = Seq((1L, 7L, 10.0, 100.0), (2L, 7L, 20.0, 300.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((7L, "BrandA")).toDF("p_partkey", "p_brand")
    val out = Basket.priceVolumeMix(li, orders, part).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5),
        r.getDouble(6), r.getDouble(7)))
    assert(out.toSeq == Seq(("BrandA", 10L, 20L, 100.0, 100.0, 200.0)))
  }

  test("prioritySla: urgent SLA flags the slow line, low SLA forgives it") {
    import graft.operators.Basket
    import java.sql.Timestamp
    val orders = Seq(
      (1L, Timestamp.valueOf("1995-01-01 00:00:00"), "1-URGENT"),
      (2L, Timestamp.valueOf("1995-01-01 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, Timestamp.valueOf("1995-01-05 00:00:00")), // lag 4 ≤ 7
      (1L, Timestamp.valueOf("1995-02-01 00:00:00")), // lag 31 > 7: late
      (2L, Timestamp.valueOf("1995-02-01 00:00:00"))) // lag 31 ≤ 90
      .toDF("l_orderkey", "l_shipdate")
    val out = Basket.prioritySla(li, orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(("1-URGENT", 2L, 1L, 17.5, 0.5),
      ("5-LOW", 1L, 0L, 31.0, 0.0)))
  }

  test("yoyGrowth: first year NULL, then the exact growth percentage") {
    import graft.operators.Basket
    val orders = Seq(
      (1L, java.sql.Timestamp.valueOf("1995-03-01 00:00:00"), 100.0),
      (2L, java.sql.Timestamp.valueOf("1996-03-01 00:00:00"), 150.0),
      (3L, java.sql.Timestamp.valueOf("1997-03-01 00:00:00"), 120.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Basket.yoyGrowth(orders).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq((1995L, None), (1996L, Some(50.0)),
      (1997L, Some(-20.0))))
  }

  test("topMovers: brands swapping revenue lead swap ranks symmetrically") {
    import graft.operators.Basket
    val li = Seq((1L, 1L, 100.0), (1L, 2L, 50.0), (2L, 1L, 50.0), (2L, 2L, 100.0))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice")
    val orders = Seq((1L, java.sql.Timestamp.valueOf("1996-06-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2000-06-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val part = Seq((1L, "BrandA"), (2L, "BrandB")).toDF("p_partkey", "p_brand")
    val out = Basket.topMovers(li, orders, part).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(("BrandA", 1L, 2L, -1L), ("BrandB", 2L, 1L, 1L)))
  }

  test("segmentMigration: per-period quartiles, acquisition and churn rows") {
    import graft.operators.Basket
    // p1 spends: customers 1..8 spend 100·c (tiers 1,1,2,2,3,3,4,4 by
    // the 2.75/4.5/6.25 rank quartiles ×100); in p2 customer 8 is gone
    // (churn → tier 0) and customer 9 appears (acquisition from 0);
    // p2 spends keep everyone else's rank order
    def o(id: Long, c: Long, yr: Int, price: Double) =
      (id, c, java.sql.Timestamp.valueOf(s"$yr-06-01 00:00:00"), price)
    val rows = (1L to 8L).map(c => o(c, c, 1996, 100.0 * c)) ++
      ((1L to 7L) :+ 9L).map(c => o(100 + c, c, 2000, 100.0 * c))
    val df = rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Basket.segmentMigration(df).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // customer 8: tier 4 → absent; customer 9: absent → its p2 tier
    assert(out((4L, 0L)) == 1L, s"churn row missing: $out")
    assert(out.keys.count(_._1 == 0L) == 1, s"exactly one acquisition row: $out")
    // stayers: diagonal-heavy (same rank order both periods)
    assert(out.filterKeys(k => k._1 == k._2 && k._1 > 0).values.sum >= 5,
      s"rank-stable customers must stay on the diagonal: $out")
  }

  test("supplierHhi: monopoly scores 10000, an even split scores 5000") {
    import graft.operators.Basket
    val li = Seq(
      (1L, 100.0, 0.0), (2L, 100.0, 0.0), // nation N1: two equal suppliers
      (3L, 50.0, 0.0)) // nation N2: monopoly
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val sup = Seq((1L, 10L), (2L, 10L), (3L, 20L))
      .toDF("s_suppkey", "s_nationkey")
    val nation = Seq((10L, "N1"), (20L, "N2")).toDF("n_nationkey", "n_name")
    val out = Basket.supplierHhi(li, sup, nation).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // N1: shares 0.5/0.5 → 10^4·(0.25+0.25) = 5000; N2: single → 10000
    assert(out.toSeq == Seq(("N1", 2L, 0.5, 5000.0), ("N2", 1L, 1.0, 10000.0)))
  }

  test("newVsRepeat: a customer's second order moves to the repeat bucket") {
    import graft.operators.Basket
    import java.sql.Timestamp
    val orders = Seq(
      (1L, 10L, Timestamp.valueOf("1995-01-05 00:00:00"), 10.0), // c10 first
      (2L, 10L, Timestamp.valueOf("1995-02-05 00:00:00"), 5.0), // c10 repeat
      (3L, 20L, Timestamp.valueOf("1995-02-10 00:00:00"), 20.0)) // c20 first
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Basket.newVsRepeat(orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("1995-01", 1L, 1L, 10.0, 0.0, 0.0),
      ("1995-02", 2L, 1L, 20.0, 5.0, 0.2)))
  }

  test("repeatInterval: gaps interpolate exact percentiles; single orders drop") {
    import graft.operators.Basket
    import java.sql.Timestamp
    // c10 gaps {10, 20} days → p25/p50/p75 = 12.5/15/17.5; c20 has one
    // order → contributes nothing
    val orders = Seq(
      (1L, 10L, "1995-01-01"), (2L, 10L, "1995-01-11"), (3L, 10L, "1995-01-31"),
      (4L, 20L, "1995-06-01"))
      .map { case (o, c, d) => (o, c, Timestamp.valueOf(s"$d 00:00:00")) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq((10L, "AUTO"), (20L, "AUTO"))
      .toDF("c_custkey", "c_mktsegment")
    val out = Basket.repeatInterval(orders, cust).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(("AUTO", 2L, 12.5, 15.0, 17.5)))
  }

  test("priceDispersion: hand-checked cv and spread on two price points") {
    import graft.operators.Basket
    // brand B1 unit prices {10, 10, 20, 20}: mean 15, sd 5 → cv 0.3333,
    // spread 2.0
    val li = Seq(
      (1L, 20.0, 2.0), (1L, 10.0, 1.0), (2L, 40.0, 2.0), (2L, 20.0, 1.0))
      .toDF("l_partkey", "l_extendedprice", "l_quantity")
    val part = Seq((1L, "B1"), (2L, "B1")).toDF("p_partkey", "p_brand")
    val out = Basket.priceDispersion(li, part).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(("B1", 4L, 15.0, 0.3333, 2.0)))
  }
}
