package graft

import org.apache.spark.sql.functions._
import graft.operators.{DataQuality, Maintenance}

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("mergeState: merging disjoint partial states equals a full recompute") {
    val rows = Seq(
      ("O", 10.0), ("O", 20.0), ("F", 5.0), ("F", 7.0), ("P", 100.0))
      .toDF("k", "v")
    // split so key P exists only in the delta (full-outer merge path)
    val base = Maintenance.aggState(rows.filter(col("v") < 50.0), "k", "v")
    val delta = Maintenance.aggState(rows.filter(col("v") >= 50.0), "k", "v")
    val merged = Maintenance.readView(Maintenance.mergeState(base, delta, "k"), "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val full = Maintenance.readView(Maintenance.aggState(rows, "k", "v"), "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(merged.toSeq == full.toSeq)
    assert(merged.toSeq.contains(("P", 1L, 100.0, 100.0)))
  }

  test("expectations: planted violations are counted, clean checks pass") {
    val li = Seq(
      // (orderkey, linenumber, qty, discount, returnflag, price)
      (1L, 1L, 10.0, 0.05, "A", 100.0),
      (1L, 2L, 99.0, 0.05, "N", 100.0), // qty out of range
      (2L, 1L, 10.0, 0.50, "X", 100.0), // discount OOR + bad returnflag
      (2L, 1L, 10.0, 0.05, "R", 100.0), // duplicate (2,1) key
      (9L, 1L, 10.0, 0.05, "R", 100.0)) // orphan order 9
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag", "l_extendedprice")
    val orders = Seq(1L, 2L).toDF("o_orderkey")
    val out = DataQuality.lineitemExpectations(li, orders).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("row_count_min_1") == ((5L, true)))
    assert(out("not_null_l_orderkey") == ((0L, true)))
    assert(out("range_l_quantity_1_50") == ((1L, false)))
    assert(out("range_l_discount_0_0.1") == ((1L, false)))
    assert(out("accepted_l_returnflag_ANR") == ((1L, false)))
    assert(out("positive_l_extendedprice") == ((0L, true)))
    assert(out("unique_l_orderkey_l_linenumber") == ((1L, false))) // one over-represented key
    assert(out("fk_l_orderkey_in_orders") == ((1L, false))) // the order-9 row
    assert(out.size == 8)
  }

  test("valueDrift: planted distribution shift flips the drifted flag") {
    val ref = java.sql.Timestamp.valueOf("2024-01-05 00:00:00") // day 5  -> ref half
    val cur = java.sql.Timestamp.valueOf("2024-01-25 00:00:00") // day 25 -> cur half
    // stable: identical per-bin counts in both halves -> psi == 0
    val stable = for (h <- Seq(ref, cur); v <- Seq(10.0, 30.0, 50.0, 70.0, 90.0); _ <- 1 to 4)
      yield ("stable", h, v)
    // shifted: mass moves from the lowest to the highest bin between the
    // halves; every (half x bin) cell stays populated (fixed-bin PSI has
    // no zero-share smoothing, by design -- see the operator scaladoc)
    val refVals = Seq.fill(16)(10.0) ++ Seq(30.0, 50.0, 70.0, 90.0)
    val curVals = Seq(10.0, 30.0, 50.0, 70.0) ++ Seq.fill(16)(90.0)
    val shifted = refVals.map(("shifted", ref, _)) ++ curVals.map(("shifted", cur, _))
    val out = DataQuality.valueDrift((stable ++ shifted).toDF("event_type", "ts", "value"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out("stable") == ((20L, 20L, 0.0, false)))
    val (nRef, nCur, psi, drifted) = out("shifted")
    assert(nRef == 20L && nCur == 20L)
    // analytic PSI: two symmetric (0.8 vs 0.05) bins, three unchanged
    // bins -> 2 * 0.75 * ln(16) = 4.1589
    assert(math.abs(psi - 4.1589) < 1e-4 && drifted)
  }

  test("cdcMerge: upsert/delete/insert with latest-wins on the sequence") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val changes = Seq(
      (1L, 1L, "U", "a1", 11.0), // update key 1...
      (1L, 2L, "U", "a2", 12.0), // ...then a later change wins
      (2L, 1L, "D", "", 0.0),    // delete key 2
      (4L, 1L, "U", "d", 40.0),  // insert new key 4
      (9L, 1L, "D", "", 0.0))    // delete of an absent key: no-op
      .toDF("k", "seq", "op", "name", "v")
    val out = Maintenance.cdcMerge(base, changes, "k", "seq", "op", Seq("name", "v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a2", 12.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("idempotentLoad: replaying a partition batch replaces, never appends") {
    val dir = graft.sources.Export.tempDir("idem_spec_").toString + "/d"
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)).toDF("id", "p", "v")
    Maintenance.idempotentLoad(df, dir, Seq("p"))
    Maintenance.idempotentLoad(df.filter(col("p") === "a"), dir, Seq("p"))
    assert(spark.read.parquet(dir).count() == 3) // retry did not duplicate
    // a CHANGED retry batch wins over the stale partition contents, and
    // partitions it does not touch survive
    Maintenance.idempotentLoad(Seq((9L, "b", 9.0)).toDF("id", "p", "v"), dir, Seq("p"))
    val after = spark.read.parquet(dir)
    assert(after.filter(col("p") === "b").collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(after.count() == 3)
  }

  test("kAnonymity: under-k classes flagged, risk is 1/class_size") {
    val df = Seq.fill(5)(("US", "A")) ++ Seq(("US", "B"), ("UK", "A"), ("UK", "A"))
    val out = DataQuality.kAnonymity(df.toDF("nat", "seg"), Seq("nat", "seg"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("UK", "A", 2L, false, 0.5),
      ("US", "A", 5L, true, 0.2),
      ("US", "B", 1L, false, 1.0)))
  }

  test("benford: first digits counted from the integer part, expectation constants 4dp") {
    // 6× digit-1, 2× digit-9, 2× digit-5; sub-1 values excluded
    val vals = Seq(1.0, 12.5, 150.0, 1999.99, 10.0, 17.3, 900.1, 99.9, 5.5, 50.0, 0.4)
    val out = DataQuality.benfordAudit(vals.toDF("v"), "v").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L)._1 == 6L && out(5L)._1 == 2L && out(9L)._1 == 2L)
    assert(out.size == 3) // absent digits are absent, not zero rows
    assert(out(1L)._2 == 0.6) // 6/10 observed share
    assert(out(1L)._3 == 0.3010 && out(5L)._3 == 0.0792 && out(9L)._3 == 0.0458)
  }

  test("scd2: unchanged values collapse; episodes tile half-open intervals") {
    val ch = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "A"),
      (1L, "2024-01-02 00:00:00", 2L, "A"), // unchanged -> same episode
      (1L, "2024-01-03 00:00:00", 3L, "B"),
      (1L, "2024-01-04 00:00:00", 4L, "A"), // A again -> NEW episode, not merged
      (2L, "2024-01-05 00:00:00", 5L, "X"))
      .toDF("k", "ts0", "tie", "attr")
      .select(col("k"), to_timestamp(col("ts0")).as("ts"), col("tie"), col("attr"))
    val out = Maintenance.scd2(ch, "k", "ts", "tie", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getBoolean(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, "A", "2024-01-01 00:00:00", "2024-01-03 00:00:00", false, 1L),
      (1L, "B", "2024-01-03 00:00:00", "2024-01-04 00:00:00", false, 2L),
      (1L, "A", "2024-01-04 00:00:00", null, true, 3L),
      (2L, "X", "2024-01-05 00:00:00", null, true, 1L)))
  }

  test("cdcMerge: replaying the same batch is idempotent") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    val changes = Seq((1L, 1L, "U", "a1", 11.0), (2L, 1L, "D", "", 0.0),
      (5L, 1L, "U", "e", 50.0)).toDF("k", "seq", "op", "name", "v")
    val once = Maintenance.cdcMerge(base, changes, "k", "seq", "op", Seq("name", "v"))
    val twice = Maintenance.cdcMerge(once, changes, "k", "seq", "op", Seq("name", "v"))
    assert(twice.orderBy("k").collect().toSeq == once.orderBy("k").collect().toSeq)
  }

  test("erase rewrites only range-hit files; untouched files copy byte-identically") {
    import graft.operators.Layout
    import graft.sources.Export
    val src = Export.tempDir("erase_src_").toString
    val dst = Export.tempDir("erase_dst_").toString
    // clustered: 8 files with disjoint key ranges over 0..799
    Layout.clusterWrite(
      spark.range(0, 800).selectExpr("id AS k", "id * 2 AS v"), "k", src, 8)
    val stats = Maintenance.erase(spark, src, dst, "k", Seq(5L, 7L))
    assert(stats.filesTotal == 8 && stats.rowsErased == 2)
    assert(stats.filesRewritten == 1, "keys 5 and 7 live in ONE range file")
    val out = spark.read.parquet(dst)
    assert(out.count() == 798)
    assert(out.filter(col("k").isin(5L, 7L)).count() == 0)
    // every untouched source file must exist in dest with identical bytes
    val srcFiles = java.nio.file.Files.list(java.nio.file.Paths.get(src))
      .toArray.map(_.toString).filter(_.endsWith(".parquet"))
    val copied = srcFiles.filter { f =>
      val d = java.nio.file.Paths.get(dst).resolve(
        java.nio.file.Paths.get(f).getFileName)
      java.nio.file.Files.exists(d) &&
        java.util.Arrays.equals(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
          java.nio.file.Files.readAllBytes(d))
    }
    assert(copied.length == 7, s"expected 7 byte-identical copies, got ${copied.length}")
  }

  test("column entropy: uniform beats skewed, constant is zero") {
    import graft.operators.Profile
    val d = spark.range(0, 400).selectExpr(
      "CAST(id % 4 AS STRING) AS uniform4",   // 2 bits exactly
      "CASE WHEN id < 396 THEN 'a' ELSE 'b' END AS skewed",
      "'x' AS const")
    val e = Profile.columnEntropy(d, Seq("uniform4", "skewed", "const"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(e("uniform4") == ((4L, 2.0)))
    assert(e("const") == ((1L, -0.0)) || e("const") == ((1L, 0.0)))
    assert(e("skewed")._1 == 2L && e("skewed")._2 > 0.0 && e("skewed")._2 < 0.1)
  }

  test("referential audit: orphans counted, NULL fk ignored, clean relation clean") {
    import graft.operators.DataQuality
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(3L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val out = DataQuality.referentialAudit(Seq(
      ("broken", child, "fk", parent, "pk"),
      ("clean", child.filter(col("fk") <= 2 || col("fk").isNull), "fk", parent, "pk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // key 3 orphans twice but is ONE missing key; the NULL fk is neither
    assert(out("broken") == ((5L, 2L, 1L)))
    assert(out("clean") == ((3L, 0L, 0L)))
  }

  test("chi2: exact independence gives 0; a diagonal table gives chi2 = n, V = 1") {
    import graft.operators.DataQuality
    // proportional cells → expected == observed → chi2 0, V 0
    val indep = (Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(20)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))).toDF("a", "b")
    val i = DataQuality.chi2Independence(indep, "a", "b").head()
    assert((i.getLong(0), i.getLong(1), i.getDouble(2), i.getDouble(3)) == ((90L, 1L, 0.0, 0.0)))
    // perfect diagonal association: the EMPTY off-diagonal cells carry
    // half the statistic — chi2 = n exactly, Cramér's V = 1
    val diag = (Seq.fill(10)(("r1", "c1")) ++ Seq.fill(10)(("r2", "c2"))).toDF("a", "b")
    val d = DataQuality.chi2Independence(diag, "a", "b").head()
    assert((d.getLong(0), d.getLong(1), d.getDouble(2), d.getDouble(3)) == ((20L, 1L, 20.0, 1.0)))
  }

  test("eventOrderAudit: a back-shifted event produces exactly one inversion downstream") {
    import graft.operators.DataQuality
    // user 1 by ts: id 1 (10:00), id 3 (10:02 — arrived early), id 2
    // (10:05) → the pair (3 → 2) is the single inversion
    val ev = Seq(
      (1L, 1L, "a", "2024-01-01 10:00:00"), (3L, 1L, "a", "2024-01-01 10:02:00"),
      (2L, 1L, "a", "2024-01-01 10:05:00"))
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = DataQuality.eventOrderAudit(ev).head()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      (("a", 3L, 1L, 0.3333)))
  }

  test("lDiversity: a large-but-uniform class fails l while a small diverse one passes") {
    import graft.operators.DataQuality
    // class g1: 5 rows, all sensitive 'x' → k=5 but l=1 (the k-anonymity
    // blind spot); class g2: 3 rows with 3 distinct values → meets l=3
    val df = (Seq.fill(5)(("g1", "x")) ++ Seq(("g2", "x"), ("g2", "y"), ("g2", "z")))
      .toDF("qid", "sens")
    val out = DataQuality.lDiversity(df, Seq("qid"), "sens", l = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("g1") == ((5L, 1L, false)))
    assert(out("g2") == ((3L, 3L, true)))
  }

  test("tCloseness: a skewed-but-diverse class fails t while a proportional one passes") {
    // global dist: x 50%, y 50%. class g1 mirrors it exactly (tvd 0);
    // class g2 is ALL x — diverse enough for nothing, tvd = 0.5 (the
    // l-diversity blind spot t-closeness exists to catch is skew, so g2
    // uses two values 3:1 → tvd 0.25 > t). Hand-computed distances.
    val df = (Seq(("g1", "x"), ("g1", "y"), ("g1", "x"), ("g1", "y")) ++
        Seq(("g2", "x"), ("g2", "x"), ("g2", "x"), ("g2", "y")))
      .toDF("qid", "sens")
    val out = DataQuality.tCloseness(df, Seq("qid"), "sens", t = 0.2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // global: x 5/8, y 3/8. g1: x 1/2, y 1/2 → tvd = 0.5*(|.5-.625|+|.5-.375|) = 0.125
    assert(out("g1") == ((4L, 0.125, true)))
    // g2: x 3/4, y 1/4 → tvd = 0.5*(|.75-.625|+|.25-.375|) = 0.125? No:
    // 0.5*(0.125+0.125) = 0.125 — symmetric classes mirror each other.
    assert(out("g2") == ((4L, 0.125, true)))
    // an ALL-x class against the same global IS out of tolerance
    val df2 = (Seq(("g1", "x"), ("g1", "y")) ++ Seq.fill(2)(("g2", "x"))).toDF("qid", "sens")
    val out2 = DataQuality.tCloseness(df2, Seq("qid"), "sens", t = 0.2).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // global: x 3/4, y 1/4; g2: x 1, y 0 → tvd = 0.5*(0.25+0.25) = 0.25
    assert(out2("g2") == 0.25)
    assert(out2("g1") == 0.25)
  }

  test("dpGroupCounts: noise is deterministic, bounded in distribution, and clamped at 0") {
    import graft.operators.DataQuality
    val rows = (1 to 400).map(i => (s"g${i % 40}", i)).toDF("k", "v")
    val a = DataQuality.dpGroupCounts(rows, Seq("k"), eps = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val b = DataQuality.dpGroupCounts(rows, Seq("k"), eps = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq) // same release on re-execution (retry safety)
    assert(a.forall(_._2 >= 0L)) // clamped
    // true count is 10 per group; ε=1 two-sided geometric noise should
    // leave most releases within ±5 and at least one group perturbed
    val devs = a.map { case (_, n) => math.abs(n - 10L) }
    assert(devs.count(_ <= 5L) >= 30, s"noise too heavy: ${devs.toSeq}")
    assert(devs.exists(_ > 0L), "noise never fired — mechanism degenerate")
    // a different salt is a different release
    val c = DataQuality.dpGroupCounts(rows, Seq("k"), eps = 1.0, salt = "dp2")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(c.toSeq != a.toSeq)
  }

  test("fdAudit: a violated FD gets its exact g3 repair fraction, an exact FD holds") {
    // l=1 → {a, a, b}: keep the 2-row majority, delete 1; l=2 → {c}:
    // clean. g3 = 1 − (2+1)/4 = 0.25
    val broken = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c")).toDF("l", "r")
    val b = DataQuality.fdAudit(broken, "t.l->r", "l", "r").head()
    assert((b.getString(0), b.getLong(1), b.getLong(2), b.getLong(3),
      b.getDouble(4), b.getBoolean(5)) == (("t.l->r", 4L, 2L, 1L, 0.25, false)))
    val exact = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("l", "r")
    val e = DataQuality.fdAudit(exact, "t2.l->r", "l", "r").head()
    assert(e.getDouble(4) == 0.0 && e.getBoolean(5))
  }

  test("freshness: staleness in whole hours vs the table's own frontier") {
    val rows = Seq(
      (1L, "live", java.sql.Timestamp.valueOf("2024-01-10 12:00:00")),
      (2L, "live", java.sql.Timestamp.valueOf("2024-01-09 12:00:00")),
      (3L, "stale", java.sql.Timestamp.valueOf("2024-01-08 11:30:00")))
      .toDF("event_id", "event_type", "ts")
    val out = DataQuality.freshness(rows).collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("live", "2024-01-10 12:00:00", 0L, true),
      ("stale", "2024-01-08 11:30:00", 48L, false)))
  }

  test("suggestConstraints: p1..p99 range support and the in-set rule by hand") {
    // values 1..100: p1 = 1.99, p99 = 99.01 (interpolated), in-range =
    // {2..99} → support 0.98; one event_type → in_set of 1
    val ev = (1 to 100).map(i => (i.toLong, "a", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val out = DataQuality.suggestConstraints(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), r.getDouble(5))))
      .toMap
    assert(out(("value", "range_p1_p99")) ==
      ((Some(1.99), Some(99.01), None, 0.98)))
    assert(out(("value", "not_null"))._4 == 1.0)
    assert(out(("event_type", "in_set")) == ((None, Some(1.0), Some("a"), 1.0)))
  }

  test("keyAudit: a duplicated candidate reports its surplus rows") {
    val dup = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "p")
    val d = DataQuality.keyAudit(dup, "t.k", Seq("k")).head()
    assert((d.getString(0), d.getLong(1), d.getLong(2), d.getLong(3),
      d.getBoolean(4)) == (("t.k", 3L, 2L, 1L, false)))
    val u = DataQuality.keyAudit(dup, "t.(k,p)", Seq("k", "p")).head()
    assert(u.getBoolean(4), "the composite candidate is a key")
  }

  test("splitLeakage finds exactly the planted cross-split clones") {
    // 60 clones of one text across ids 1..60 — md5 scatters them over
    // all three splits — plus unique texts that can never leak.
    // Expected counts computed with the SAME md5 assignment here.
    def split(id: Long): String = {
      val h2 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(1)
        .map("%02x".format(_)).mkString
      if (h2 < "08") "test" else if (h2 < "18") "validation" else "train"
    }
    val counts = (1L to 60L).map(split).groupBy(identity).view.mapValues(_.size)
    val (nTr, nVa, nTe) =
      (counts.getOrElse("train", 0), counts.getOrElse("validation", 0),
        counts.getOrElse("test", 0))
    assert(nTr > 0 && nVa > 0 && nTe > 0, s"md5 must scatter: $counts")
    val docs = ((1L to 60L).map(id => (id, "the shared clone text")) ++
      (100L to 140L).map(id => (id, s"unique text number $id")))
      .toDF("doc_id", "text")
    val out = DataQuality.splitLeakage(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("train|validation") == ((1L, (nTr + nVa).toLong)))
    assert(out("train|test") == ((1L, (nTr + nTe).toLong)))
    assert(out("validation|test") == ((1L, (nVa + nTe).toLong)))
  }

  test("rareLevels: a level at exactly min share is NOT rare, below is") {
    val df = ((1 to 995).map(_ => "big") ++ (1 to 4).map(_ => "tiny") ++
      Seq("edge")) // 1/1000 = 0.001 < 0.005 rare; tiny 0.004 rare
      .map(Tuple1(_)).toDF("k")
    val r = DataQuality.rareLevels(Seq(("t.k", df, "k"))).head()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      (("t.k", 3L, 2L, 0.005)))
  }

  test("tableFingerprints: order-independent, content-sensitive") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val b = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("k", "v") // reordered
    val c = Seq((1L, "x"), (2L, "y"), (3L, "Q")).toDF("k", "v") // changed
    val rows = DataQuality.tableFingerprints(Seq(
      ("a", a, Seq("k", "v")), ("b", b, Seq("k", "v")),
      ("c", c, Seq("k", "v")))).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows("a")._1 == 3L)
    assert(rows("a") == rows("b"), "row order must not change the fingerprint")
    assert(rows("a")._2 != rows("c")._2, "a changed row must change it")
  }

  test("bootstrapCi: the interval brackets the true mean of a flat sample") {
    val orders = (1L to 500L).map(i => (i, i.toDouble))
      .toDF("o_orderkey", "o_totalprice")
    val r = DataQuality.bootstrapCi(orders).head()
    val (n, lo, hi, bm, est) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    assert(n == 200L && est == 250.5)
    assert(lo <= bm && bm <= hi)
    assert(lo <= est && est <= hi, s"CI [$lo, $hi] must bracket $est")
    assert(hi - lo < 60.0, s"CI width ${hi - lo} implausibly wide")
  }

  test("reconcile: presence markers and null-safe compares count every case") {
    val left = Seq((1L, 1, 10.0, 5.0), (2L, 1, 20.0, 5.0), (3L, 1, 30.0, 5.0))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    // row 1 unchanged, row 2 changed, row 3 dropped, row 4 right-only
    val right = Seq((1L, 1, 10.0, 5.0), (2L, 1, 21.0, 5.0), (4L, 1, 40.0, 5.0))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val r = DataQuality.reconcile(left, right,
      Seq("l_orderkey", "l_linenumber"),
      Seq("l_quantity", "l_extendedprice")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((3L, 3L, 1L, 1L, 1L, 1L)))
  }

  test("temporalAudit: a ship-before-order line is a violation with its lag") {
    import java.sql.Timestamp
    val orders = Seq((1L, Timestamp.valueOf("1995-03-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq((1L, Timestamp.valueOf("1995-02-24 00:00:00")),
      (1L, Timestamp.valueOf("1995-03-11 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
    val r = DataQuality.temporalAudit(li, orders).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) == ((1995L, 2L, 1L, -5L, 10L, 0.5)))
  }

  test("anovaAudit: textbook two-group F and eta-squared") {
    // A={1,2,3}, B={4,5,6}: SSB=13.5, SSW=4, F=(13.5/1)/(4/4)=13.5,
    // eta2 = 13.5/17.5 = 0.771429 (6dp)
    val orders = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 4.0), ("B", 5.0), ("B", 6.0))
      .toDF("o_orderstatus", "o_totalprice")
    val r = DataQuality.anovaAudit(orders).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      ((2L, 6L, 13.5, 0.771429)))
  }

  test("spearmanAudit: tie-averaged ranks give the textbook rho") {
    // qty (1,1,2) vs disc (5,6,7): tied qty ranks average to 1.5 →
    // rho = cov/sd·sd = sqrt(0.75) ≈ 0.8660; qty vs tax monotone
    // DECREASING → rho exactly −0.8660 by the same tie structure
    val li = Seq((1.0, 5.0, 3.0), (1.0, 6.0, 2.0), (2.0, 7.0, 1.0))
      .toDF("l_quantity", "l_discount", "l_tax")
    val r = DataQuality.spearmanAudit(li).head()
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 0.866)
    assert(r.getDouble(2) == -0.866)
    assert(r.getDouble(3) == -1.0)
  }

  test("xiCorr: any strictly monotone dependence scores 1 − 3/(n+1)") {
    // n=9, y monotone in x → every |Δr| = 1, Σ = 8, ξ = 1 − 24/80 = 0.7;
    // direction doesn't matter (ξ measures dependence, not sign)
    import java.sql.Timestamp
    def orders(up: Boolean) = (1L to 9L).map { i =>
      val y = if (up) i * 10.0 else (10 - i) * 10.0
      (i, "A", Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00"), y)
    }.toDF("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
    for (up <- Seq(true, false)) {
      val r = DataQuality.xiCorr(orders(up)).head()
      assert((r.getLong(1), r.getLong(2), r.getDouble(3)) == ((9L, 8L, 0.7)))
    }
  }

  test("anovaTwoWay: balanced 2x2 with a pure column effect decomposes exactly") {
    // cells (A,X)={1,3} (A,Y)={5,7} (B,X)={1,3} (B,Y)={5,7}: grand mean 4;
    // SS_A=0, SS_B=32, SS_int=0, SS_within=8, SS_total=40
    val li = Seq(
      ("A", "X", 1.0), ("A", "X", 3.0), ("A", "Y", 5.0), ("A", "Y", 7.0),
      ("B", "X", 1.0), ("B", "X", 3.0), ("B", "Y", 5.0), ("B", "Y", 7.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val out = DataQuality.anovaTwoWay(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("factor_a", 1L, 0.0, 0.0), ("factor_b", 1L, 32.0, 0.8),
      ("interaction", 1L, 0.0, 0.0), ("total", 7L, 40.0, 1.0),
      ("within", 4L, 8.0, 0.2)))
  }

  test("levelDrift: a level appearing only late is new, one vanishing is gone") {
    // first half priorities {A,B}, second half {B,C}; status constant
    import java.sql.Timestamp
    val orders = Seq(
      ("1995-01-01", "A"), ("1995-01-03", "B"),
      ("1995-01-28", "B"), ("1995-01-31", "C"))
      .map { case (d, p) => (Timestamp.valueOf(s"$d 00:00:00"), p, "O") }
      .toDF("o_orderdate", "o_orderpriority", "o_orderstatus")
    val out = DataQuality.levelDrift(orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("o_orderpriority", 2L, 2L, 1L, 1L),
      ("o_orderstatus", 1L, 1L, 0L, 0L)))
  }

  test("assocMatrix: perfect determination scores 1.0 on every metric") {
    // x fully determines y and vice versa: chi2 = n, phi2 = 1,
    // phi2corr = 1 - 1/(n-1) = rcorr - 1 = ccorr - 1 -> Vcorr = 1;
    // H(X|Y) = H(Y|X) = 0 -> both Theil U = 1
    val df = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "q"),
      ("a", "p"), ("b", "q")).toDF("x", "y")
    val out = DataQuality.assocMatrix(df, Seq("x", "y")).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) == ("x", "y"))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == (2L, 2L, 6L))
    assert((r.getDouble(5), r.getDouble(6), r.getDouble(7)) == (1.0, 1.0, 1.0))
  }

  test("assocMatrix: independent uniform columns score 0.0, pairs enumerate i<j") {
    // perfectly balanced 2x2 -> chi2 = 0 -> phi2corr clamps to 0;
    // H(X|Y) = H(X) -> U = 0. Third column checks pair enumeration
    // (balanced against both others — a constant column is refused).
    val df = Seq(("a", "p", "k"), ("a", "q", "m"), ("b", "p", "m"),
      ("b", "q", "k")).toDF("x", "y", "z")
    val out = DataQuality.assocMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(5)))
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq(("x", "y"), ("x", "z"), ("y", "z")))
    assert(out.forall(_._3 == 0.0)) // every pair balanced → V = 0
  }

  test("wassersteinDrift: a unit value shift measures exactly 1.0; one-sided types drop") {
    // type a: ref half all 1.00, cur half all 2.00 -> the CDFs differ
    // by 1 over a 100-cent gap: W1 = 1.0 exactly. type b exists only
    // in the ref half -> filtered (no comparison possible).
    import java.sql.Timestamp
    val rows =
      (1 to 4).map(i => (i.toLong, Timestamp.valueOf(s"2024-01-0$i 10:00:00"), "a", 1.0)) ++
      (1 to 4).map(i => (10L + i, Timestamp.valueOf(s"2024-01-2$i 10:00:00"), "a", 2.0)) ++
      Seq((20L, Timestamp.valueOf("2024-01-03 10:00:00"), "b", 9.0))
    val df = rows.toDF("event_id", "ts", "event_type", "value")
    val out = DataQuality.wassersteinDrift(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", 4L, 4L, 1.0)))
  }

  test("assocMatrix refuses a high-cardinality column instead of collecting it") {
    val df = (1 to 500).map(i =>
      (s"user$i", if (i % 2 == 0) "a" else "b")).toDF("hi_card", "flag")
    val e = intercept[IllegalArgumentException] {
      DataQuality.assocMatrix(df, Seq("hi_card", "flag"), maxGridRows = 100)
    }
    assert(e.getMessage.contains("high-cardinality"))
  }

  test("assocMatrix refuses a constant column instead of emitting NaN") {
    val df = (1 to 50).map(i =>
      (if (i % 2 == 0) "a" else "b", "const")).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      DataQuality.assocMatrix(df, Seq("x", "y"))
    }
    assert(e.getMessage.contains("constant column"))
  }
}
