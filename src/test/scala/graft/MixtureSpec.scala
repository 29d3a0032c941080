package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixture

class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  test("groupSample keeps exactly n rows per group, stably") {
    val d = spark.range(0, 300)
      .selectExpr("id AS doc_id", "CAST(id % 3 AS STRING) AS g")
    val s = Mixture.groupSample(d, col("g"), col("doc_id"), 7).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(s.length == 21)
    assert(s.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._3).sorted.toSeq == (1L to 7L) })
    // stability: appending rows to OTHER groups never changes a group's
    // chosen sample (the md5 rank is data-independent)
    val d2 = spark.range(0, 400) // group "0" gains rows only via id%3
      .selectExpr("id AS doc_id", "CAST(id % 3 AS STRING) AS g")
      .filter(col("doc_id") < 300 || col("doc_id") % 3 === 1)
    val s2 = Mixture.groupSample(d2, col("g"), col("doc_id"), 7).collect()
      .map(r => (r.getString(1), r.getLong(0)))
    assert(s2.filter(_._1 == "0").toSet == s.filter(_._1 == "0").map(t => (t._1, t._2)).toSet)
    assert(s2.filter(_._1 == "2").toSet == s.filter(_._1 == "2").map(t => (t._1, t._2)).toSet)
  }

  test("hash sampling is deterministic, rate-accurate and map-only") {
    val d = spark.range(0, 4000).toDF("id")
    val once = Mixture.hashSample(d, col("id"), 8).collect().map(_.getLong(0)).toSet
    val twice = Mixture.hashSample(d, col("id"), 8).collect().map(_.getLong(0)).toSet
    assert(once == twice) // same keys every run
    // 8/16 rate: binomial(4000, 0.5) stays within ±5 sigma of 2000
    assert(math.abs(once.size - 2000) < 160, s"got ${once.size} of 4000 at rate 1/2")
    // rate 0 keeps nothing; rate 16 keeps everything
    assert(Mixture.hashSample(d, col("id"), 0).count() == 0L)
    assert(Mixture.hashSample(d, col("id"), 16).count() == 4000L)
    // the filter is a pure map stage: no shuffle in the sampled plan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val sampled = Mixture.hashSample(d, col("id"), 8)
    sampled.collect()
    val shuffles = flattenPlan(sampled.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, "mixture sampling must not shuffle")
  }

  test("per-group thresholds mix groups at different rates in one pass") {
    val d = spark.range(0, 2000)
      .select(col("id"), (col("id") % 2).cast("string").as("grp"))
    val thr = when(col("grp") === "0", lit("c")).otherwise(lit("2")) // 12/16 vs 2/16
    val counts = Mixture.hashMixture(d, col("id"), thr)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 keys per group: expect ~750 vs ~125; ±5 sigma bounds
    assert(math.abs(counts("0") - 750) < 70, s"grp0=${counts("0")}")
    assert(math.abs(counts("1") - 125) < 55, s"grp1=${counts("1")}")
    // sampling decisions depend only on the key, not the group: a key
    // kept at 2/16 is also kept at 12/16 (nested samples — rate changes
    // grow/shrink the sample monotonically, they never reshuffle it)
    val low = Mixture.hashSample(d, col("id"), 2).collect().map(_.getLong(0)).toSet
    val high = Mixture.hashSample(d, col("id"), 12).collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
  }

  test("assignSplit: exhaustive, disjoint, rate-accurate, append-stable, map-only") {
    val d = spark.range(0, 4000).toDF("id")
    val out = Mixture.assignSplit(d, col("id"))
    out.collect()
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row gets exactly one split
    assert(counts.values.sum == 4000L)
    assert(counts.keySet == Set("train", "validation", "test"))
    // 8/256 ≈ 125, 16/256 ≈ 250 expected; ±5 sigma
    assert(math.abs(counts("test") - 125) < 55, s"test=${counts("test")}")
    assert(math.abs(counts("validation") - 250) < 78, s"val=${counts("validation")}")
    // append stability: a doc's split never changes when the corpus grows
    val testIds = out.filter(col("split") === "test").collect().map(_.getLong(0)).toSet
    val grown = Mixture.assignSplit(spark.range(0, 8000).toDF("id"), col("id"))
    val testIds2 = grown.filter(col("split") === "test" && col("id") < 4000)
      .collect().map(_.getLong(0)).toSet
    assert(testIds == testIds2)
    // assignment is a pure map stage
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val shuffles = flattenPlan(out.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, "split assignment must not shuffle")
  }

  test("weightedSample: ranks by the max of w independent md5 draws") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def drawKey(k: Long, w: Int): String = (1 to w).map(i => md5hex(s"$k:$i")).max
    val items = Seq((1L, 1), (2L, 3), (3L, 2), (4L, 4), (5L, 1))
    val df = items.toDF("k", "w")
    val out = Mixture.weightedSample(df, "k", col("w"), 3).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    // independent reference: same draws computed driver-side, ordered
    // draw DESC with key ASC tie-break exactly like the operator
    val byDrawDescKeyAsc =
      Ordering.Tuple2(Ordering.String.reverse, Ordering.Long)
    val expect = items.map { case (k, w) => (k, drawKey(k, w)) }
      .sortBy { case (k, d) => (d, k) }(byDrawDescKeyAsc).take(3)
    assert(out.toSeq == expect)
    // every draw key is genuinely the max over that item's w tickets
    assert(out.forall { case (k, d) => d == drawKey(k, items.toMap.apply(k).toInt) })
  }

  test("weightedSample: weight 1 everywhere degrades to the uniform hash sample") {
    val df = spark.range(0, 500).toDF("id")
    val viaWeighted = Mixture.weightedSample(df, "id", lit(1), 50)
      .collect().map(_.getLong(0)).toSet
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val direct = (0L until 500L).map(i => i -> md5hex(s"$i:1"))
      .sortBy { case (i, d) => (d, i) }(
        Ordering.Tuple2(Ordering.String.reverse, Ordering.Long))
      .take(50).map(_._1).toSet
    assert(viaWeighted == direct)
  }

  test("tokenBudget matches the greedy reference and never overspends") {
    val docs = Tables.t(spark, sfDir, "documents")
    val budget = 10000L
    val kept = Mixture.tokenBudget(docs, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(kept.map(_._2).sum <= budget)
    // greedy reference: docs in (n_distinct desc, doc_id) order, score
    // classes admitted whole while they fit; the boundary class admits a
    // doc_id-ordered prefix (stop at the first overflow)
    val all = docs.select(col("doc_id"),
      size(graft.operators.TextOps.tokens(col("text"))).cast("long"),
      size(array_distinct(graft.operators.TextOps.tokens(col("text")))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byScore = all.groupBy(_._3).toSeq.sortBy(-_._1)
    var cum = 0L
    val ref = scala.collection.mutable.Set[Long]()
    for ((_, ds) <- byScore) {
      val scoreTotal = ds.map(_._2).sum
      if (cum + scoreTotal <= budget) { ref ++= ds.map(_._1); cum += scoreTotal }
      else if (cum < budget) {
        var boundaryCum = cum
        for ((id, n, _) <- ds.sortBy(_._1)) {
          if (boundaryCum + n <= budget) { ref += id; boundaryCum += n }
          else boundaryCum = budget + 1 // prefix rule: first overflow stops admission
        }
        cum = budget + 1 // later (smaller) score classes are all past the threshold
      }
    }
    assert(kept.map(_._1).toSet == ref.toSet)
  }

  test("temperature sampling: floor(scale·√n) per group, big groups downweighted") {
    val d = spark.range(0, 500).selectExpr("id AS doc_id",
      "CASE WHEN id < 400 THEN 'big' ELSE 'small' END AS src")
    val out = Mixture.temperatureSample(d, "doc_id", "src", 2.0).collect()
    val byG = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byG("big") == 40)   // floor(2·√400)
    assert(byG("small") == 20) // floor(2·√100)
    // the α<1 point: keep-RATIO falls as the group grows (10% vs 20%)
    assert(byG("big").toDouble / 400 < byG("small").toDouble / 100)
    // n_target column agrees with the realized count
    assert(out.filter(_.getString(1) == "big").forall(_.getLong(3) == 40L))
    // determinism: identical picks on re-run
    val again = Mixture.temperatureSample(d, "doc_id", "src", 2.0).collect()
    assert(out.map(_.getLong(0)).toSet == again.map(_.getLong(0)).toSet)
  }

  test("epochPlan: small high-weight group caps at maxEpochs, big group under-repeats") {
    // lang a: 10 tokens at weight 0.5, budget 100 → raw 5.0 → capped to
    // 4.0 epochs, 40 effective tokens; lang b: 200 tokens → 0.25 epochs
    val docs = (Seq.fill(2)("one two three four five").map(("a", _)) :+
      ("b", Seq.fill(200)("tok").mkString(" "))).toDF("lang", "text")
    val out = Mixture.epochPlan(docs, "lang",
      when(col("lang") === "a", 0.5).otherwise(0.5), budgetTokens = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(out == Seq(("a", 10L, 4.0, 40L, true), ("b", 200L, 0.25, 50L, false)))
  }

  test("dedupWeighted: singletons untouched, duplicated copies kept at ~1/n via the md5 digit") {
    // 40 unique docs + "dup" × 16 copies + "tri" × 4 copies
    val rows = (0 until 40).map(i => (i.toLong, s"unique text $i")) ++
      (100 until 116).map(i => (i.toLong, "dup dup dup")) ++
      (200 until 204).map(i => (i.toLong, "tri tri tri"))
    val out = Mixture.dedupWeighted(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((40L, 40L, 40L)))
    // driver-side replay of the md5-digit coin for the planted clusters
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val kept16 = (100 until 116).count(i => md5hex(i.toString).head < '1') // 16/16 → rate 1/16
    val kept4 = (200 until 204).count(i => md5hex(i.toString).head < '4')  // 16/4 → rate 4/16
    assert(out(16L) == ((1L, 16L, kept16.toLong)))
    assert(out(4L) == ((1L, 4L, kept4.toLong)))
  }

  test("dsirSelect ranks target-vocabulary docs above off-domain ones") {
    import org.apache.spark.sql.functions.col
    // target docs (0-4) speak {alpha beta gamma}; docs 5-9 mimic the
    // target vocabulary WITHOUT being in the target set; docs 10-19
    // speak an off-domain vocabulary. DSIR must rank the mimics above
    // the off-domain docs — that ordering is the whole point (select
    // raw docs that LOOK like the domain).
    val rows =
      (0L to 4L).map(i => (i, "alpha beta gamma alpha beta gamma alpha")) ++
      (5L to 9L).map(i => (i, "alpha beta gamma beta alpha gamma beta")) ++
      (10L to 19L).map(i => (i, "delta epsilon zeta delta epsilon zeta delta"))
    val out = Mixture.dsirSelect(rows.toDF("doc_id", "text"), col("doc_id") <= 4L,
        keep = 0.5).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    val byId = out.map(r => r._1 -> r).toMap
    // every target-vocab doc outscores every off-domain doc
    val minTargetish = (0L to 9L).map(byId(_)._2).min
    val maxOff = (10L to 19L).map(byId(_)._2).max
    assert(minTargetish > maxOff, s"target-vocab llr $minTargetish !> off-domain $maxOff")
    // keep=0.5 over 20 docs: the ten target-vocab docs are the selection
    assert((0L to 9L).forall(byId(_)._3) && (10L to 19L).forall(!byId(_)._3))
  }

  test("curriculumPhases: exact quartile cuts split 1..8 tokens into 2/2/2/2") {
    // difficulties 1..8: interpolated quartiles 2.75 / 4.5 / 6.25 →
    // phases {1,2} {3,4} {5,6} {7,8}
    val docs = (1 to 8).map(n => (n.toLong, Seq.fill(n)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Mixture.curriculumPhases(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 2L, 3L, 1L, 2L), (2L, 2L, 7L, 3L, 4L),
      (3L, 2L, 11L, 5L, 6L), (4L, 2L, 15L, 7L, 8L)))
  }

  test("neymanSample: zero-variance strata get nothing, the draw is md5-exact") {
    // aa: 10 docs of constant length (sd 0 → alloc 0); bb: 10 docs of
    // 110..200 (sd 30.28); budget = floor(20/5) = 4, all to bb
    val docs = ((1L to 10L).map(i => (i, "aa", 100L)) ++
      (11L to 20L).map(i => (i, "bb", 100L + (i - 10) * 10)))
      .toDF("doc_id", "lang", "n_chars")
    // replicate the md5-fraction draw to predict bb's realized count
    def frac(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) / 4294967296.0
    }
    val expBb = (11L to 20L).count(frac(_) < 0.4).toLong
    val out = Mixture.neymanSample(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4)))
    val sdBb = BigDecimal(math.sqrt(8250.0 / 9))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(("aa", 10L, 0.0, 0L, 0L),
      ("bb", 10L, sdBb, 4L, expBb)))
  }

  test("effectiveTokens: a duplicated doc contributes rows but no new tokens") {
    // s1 holds the same 3-token doc twice → 6 raw / 3 effective; s2's
    // 2-token doc is unique → pool 5, shares 0.6 / 0.4
    val docs = Seq((1L, "s1", "a b c"), (2L, "s1", "a b c"), (3L, "s2", "d e"))
      .toDF("doc_id", "source", "text")
    val out = graft.operators.Mixture.effectiveTokens(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(("s1", 2L, 6L, 3L, 0.5, 0.6),
      ("s2", 1L, 2L, 2L, 1.0, 0.4)))
  }
}
