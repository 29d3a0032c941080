package graft

import graft.operators.Features

class FeaturesSpec extends SparkTestBase {
  import spark.implicits._

  test("targetEncodeLoo: hand-checked leave-one-out means with smoothing") {
    // cats A={10,20}, B={30}; global mu = 20; smoothing m = 2:
    //   (A,10): ((30-10) + 2*20) / ((2-1) + 2) = 60/3 = 20.0
    //   (A,20): ((30-20) + 40) / 3            = 50/3 = 16.6667
    //   (B,30): ((30-30) + 40) / (0 + 2)      = 40/2 = 20.0
    val li = Seq(
      (1L, 1, "A", 10.0), (2L, 1, "A", 20.0), (3L, 1, "B", 30.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val out = Features.targetEncodeLoo(li, smoothing = 2.0, sampleMod = 1L)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, "A", 20.0), (2L, "A", 16.6667),
      (3L, "B", 20.0)))
  }

  test("targetEncodeLoo: encoding never leaks the row's own target") {
    // one extreme outlier in its category: its OWN encoding must not
    // move toward the outlier value more than the others' do
    val li = ((1L to 9L).map(i => (i, 1, "A", 10.0)) :+ (10L, 1, "A", 1000.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val out = Features.targetEncodeLoo(li, smoothing = 0.0, sampleMod = 1L)
      .collect().map(r => (r.getLong(0), r.getDouble(4))).toMap
    // LOO for the outlier excludes 1000 → mean of nine 10s = 10
    assert(out(10L) == 10.0)
    // LOO for a normal row includes the outlier → (8*10+1000)/9
    assert(out(1L) == 120.0)
  }

  test("targetEncodeOof: every encoding excludes exactly its own fold") {
    def fold(k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 5
    }
    def pround(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    val rows = (1L to 20L).map(k => (k, 1, "A", (k % 7).toDouble))
    val df = rows.toDF("l_orderkey", "l_linenumber", "l_returnflag",
      "l_quantity")
    val sTot = rows.map(_._4).sum
    val mu = sTot / 20.0
    val out = graft.operators.Features
      .targetEncodeOof(df, smoothing = 2.0, sampleMod = 1L)
      .collect().map(r => (r.getLong(0), r.getDouble(4))).toMap
    rows.foreach { case (k, _, _, _) =>
      val f = fold(k)
      val inFold = rows.filter(r => fold(r._1) == f)
      val sF = inFold.map(_._4).sum
      val exp = pround(((sTot - sF) + 2.0 * mu)
        / ((20 - inFold.length).toDouble + 2.0))
      assert(out(k) == exp, s"orderkey $k fold $f")
    }
  }

  test("supervisedBins: paired deciles with alternating labels flatten WoE") {
    // values 1..20 → each decile holds exactly {2k−1, 2k}; F on evens
    // → every bin has rate 0.5 and WoE exactly 0
    val orders = (1L to 20L).map(v =>
      (v, if (v % 2 == 0) "F" else "O", v.toDouble))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val out = graft.operators.Features.supervisedBins(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.map(_._1).toSeq == (1L to 10L))
    assert(out.forall(b => b._2 == 2L && b._3 == 1L && b._4 == 0.5 &&
      b._5 == 0.0), s"bins not flat: ${out.toSeq}")
  }

  test("pipelineFeatures: the composed plan equals its components joined") {
    val out = graft.queries.Suite.pipelineFeatures(spark, sfDir)
    assert(out.columns.toSeq == Seq("l_orderkey", "l_linenumber", "cat",
      "te_loo", "z_qty", "z_price", "mm_disc", "fold"))
    val n = out.count()
    assert(n > 0)
    val li = graft.Tables.t(spark, sfDir, "lineitem")
    val te = graft.operators.Features.targetEncodeLoo(li)
    assert(n == te.count(), "composition must not drop or duplicate rows")
  }

  test("aucRoc: perfect separation gives 1.0, symmetric overlap gives 0.5") {
    val perfect = Seq((1L, 3L, "en"), (2L, 4L, "en"), (3L, 1L, "de"),
      (4L, 2L, "de")).toDF("doc_id", "n_chars", "lang")
    val r1 = graft.operators.Features.aucRoc(perfect).head()
    assert((r1.getLong(0), r1.getLong(1), r1.getDouble(2), r1.getDouble(3)) ==
      ((2L, 2L, 1.0, 1.0)))
    // pos ranks {1,4} → Σ=5 → AUC (5−3)/4 = 0.5
    val mixed = Seq((1L, 1L, "en"), (2L, 4L, "en"), (3L, 2L, "de"),
      (4L, 3L, "de")).toDF("doc_id", "n_chars", "lang")
    val r2 = graft.operators.Features.aucRoc(mixed).head()
    assert((r2.getDouble(2), r2.getDouble(3)) == ((0.5, 0.0)))
  }

  test("scaler: textbook z-scores and min-max on a 3-row fit") {
    val li = Seq(
      (1L, 1, 1.0, 10.0, 0.0), (2L, 1, 2.0, 20.0, 0.05),
      (3L, 1, 3.0, 30.0, 0.1))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount")
    val out = graft.operators.Features.scaler(li, sampleMod = 1L).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, -1.0, -1.0, 0.0), (2L, 0.0, 0.0, 0.5),
      (3L, 1.0, 1.0, 1.0)))
  }

  test("kfoldPlan: disjoint exhaustive folds with a sane balance ratio") {
    val orders = (1L to 100L).map(i => (i, 50.0))
      .toDF("o_orderkey", "o_totalprice")
    val out = graft.operators.Features.kfoldPlan(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_._2).sum == 100L, "folds must partition the table")
    assert(out.forall(_._3 == 50.0))
    assert(out.forall(f => f._4 > 0.5 && f._4 < 1.5),
      s"md5 folds badly unbalanced: ${out.toSeq}")
  }

  test("pcaVerified: eigendecomposition contract verdicts all pass") {
    val r = new scala.util.Random(11)
    val rows = (1 to 40).map { i =>
      (i.toLong, if (i % 2 == 0) "A" else "B",
        Array.fill(6)(r.nextGaussian() * (1.0 + i % 3)))
    }
    val df = rows.toDF("vec_id", "label", "embedding")
    val out = graft.operators.Features.pcaVerified(df).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getLong(5)))
    assert(out.map(x => (x._1, x._2)).toSeq == Seq(("A", 20L), ("B", 20L)))
    out.foreach { case (label, _, unit, ortho, eigen, desc) =>
      assert(unit == 1L, s"$label: components not unit norm")
      assert(ortho == 1L, s"$label: components not orthogonal")
      assert(eigen == 1L, s"$label: C*v != lambda*v")
      assert(desc == 1L, s"$label: explained variance not descending in [0,1]")
    }
  }

  test("pcaProject: the leading component finds the planted variance axis") {
    // all real variance on axis 0 (spread ±10); labels offset on axis 1
    // by a constant → per-label spread concentrates in the first PC
    val rows = (1 to 20).flatMap { i =>
      val t = (i - 10.5)
      Seq((i.toLong, "A", Array(t, 0.0, 0.0, 0.0)),
        (100L + i, "B", Array(t, 5.0, 0.0, 0.0)))
    }
    val df = rows.toDF("vec_id", "label", "embedding")
    val out = graft.operators.Features.pcaProject(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4), r.getDouble(5)))
    assert(out.map(x => (x._1, x._2)).toSeq == Seq(("A", 20L), ("B", 20L)))
    out.foreach { case (label, _, sdX, sdY) =>
      assert(sdX > 1.0 && sdY < 0.1,
        s"label $label: leading-PC spread $sdX vs second $sdY")
    }
  }

  test("woeEncode: hand-checked WoE and IV against the same formula") {
    def pround(x: Double, dp: Int): Double = {
      val f = math.pow(10, dp); math.floor(x * f + 0.5) / f
    }
    // S1: 1 pos / 1 neg; S2: 1 pos / 3 neg → tp=2, tn=4
    val orders = Seq((1L, "F"), (2L, "O"), (3L, "F"), (4L, "O"),
      (5L, "O"), (6L, "P")).map { case (k, st) => (k, st) }
      .toDF("o_custkey", "o_orderstatus")
    val cust = Seq((1L, "S1"), (2L, "S1"), (3L, "S2"), (4L, "S2"),
      (5L, "S2"), (6L, "S2")).toDF("c_custkey", "c_mktsegment")
    val out = graft.operators.Features.woeEncode(orders, cust).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    def woe(pr: Double, nr: Double) = math.log(pr / nr)
    assert(out.toSeq == Seq(
      ("S1", 2L, 1L, 1L, pround(woe(0.5, 0.25), 4),
        pround((0.5 - 0.25) * woe(0.5, 0.25) * 10000.0, 4)),
      ("S2", 4L, 1L, 3L, pround(woe(0.5, 0.75), 4),
        pround((0.5 - 0.75) * woe(0.5, 0.75) * 10000.0, 4))))
  }

  test("userProfile: sessions, tenure, gaps, and spend from one planted user") {
    import java.sql.Timestamp
    val rows = Seq(
      (1L, 10L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.5),
      (2L, 10L, Timestamp.valueOf("2024-01-01 10:10:00"), 2.5),
      (3L, 10L, Timestamp.valueOf("2024-01-01 11:00:00"), 3.0),
      (4L, 11L, Timestamp.valueOf("2024-01-01 12:00:00"), 9.9)) // not sampled
      .toDF("event_id", "user_id", "ts", "value")
    val out = graft.operators.Features.userProfile(rows).collect()
    assert(out.length == 1)
    val r = out.head
    // gaps 10 min (same session) and 50 min (new session) → 2 sessions;
    // tenure 1h = 0.0417 days; avg gap (10+50)/2 = 30
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5)) ==
      ((10L, 3L, 2L, 0.0417, 30.0, 7.0)))
  }

  test("gainsChart: a perfect score ranks all positives into the top tiles") {
    // 20 docs, 5 positives holding the 5 highest scores -> the first
    // quintile-sized tiles capture them all; lift of tile 1 = 4x base
    val rows = (1 to 20).map { i =>
      (i.toLong, (100 - i) * 1000L, if (i <= 5) "en" else "de")
    }.toDF("doc_id", "n_chars", "lang")
    val out = graft.operators.Features.gainsChart(rows, buckets = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 5L, 5L, 1.0, 4.0),   // top quartile: all 5 positives, lift 4
      (2L, 5L, 0L, 1.0, 2.0),
      (3L, 5L, 0L, 1.0, 1.3333),
      (4L, 5L, 0L, 1.0, 1.0)))
  }

  test("calibrationTable: exact integer moments give the hand reliability rows") {
    // the gains fixture: scores (100-i)*1000, positives = 5 highest.
    // lo=80000, hi=99000, R=95000 over 5-doc quartiles: mean_score =
    // (sum - 5*lo)/(5*R); positives land entirely in tile 4
    val rows = (1 to 20).map { i =>
      (i.toLong, (100 - i) * 1000L, if (i <= 5) "en" else "de")
    }.toDF("doc_id", "n_chars", "lang")
    val out = graft.operators.Features.calibrationTable(rows, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, 5L, 0L, 0.1053, 0.0, 0.1053),
      (2L, 5L, 0L, 0.3684, 0.0, 0.3684),
      (3L, 5L, 0L, 0.6316, 0.0, 0.6316),
      (4L, 5L, 5L, 0.8947, 1.0, -0.1053)))
  }

  test("mutualInfo: perfect dependence scores ln 2, independence scores 0") {
    // diagonal 2x2: each cell contributes (2/4)·ln(2·4/(2·2)) = ln(2)/2
    val dep = Seq(("A", "X"), ("A", "X"), ("B", "Y"), ("B", "Y"))
      .toDF("f1", "f2")
    val out = Features.mutualInfo(dep, "f1", "f2").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.346574, 0.346574))
    assert(out.last.getDouble(4) == 0.693147) // MI = ln 2 at the last cell
    // uniform 2x2: every cell has n·N == n_r·n_c → ln(1) = 0 throughout
    val ind = Seq(("A", "X"), ("A", "Y"), ("B", "X"), ("B", "Y"))
      .toDF("f1", "f2")
    val mi = Features.mutualInfo(ind, "f1", "f2").collect()
    assert(mi.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
  }

  test("randProjCheck: basis-vector pair distortion equals m/8 from the md5 signs") {
    // for e0 vs e1: dp² = Σ_j (sg(0,j)−sg(1,j))²·10¹² = 4m·10¹², do² =
    // 2·10¹² → distortion = m/8 where m = #{j: signs differ} — counted
    // here INDEPENDENTLY from the same md5 the operator derives from
    val md = java.security.MessageDigest.getInstance("MD5")
    def sg(d: Int, j: Int): Int = {
      val h = md.digest(s"$d:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (h.charAt(0) < '8') 1 else -1
    }
    val m = (0 until 16).count(j => sg(0, j) != sg(1, j))
    val emb = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Features.randProjCheck(emb).collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getDouble(1)) == ((0L, m / 8.0)))
  }

  test("brierDecomposition: perfect and inverted forecasts bracket the decomposition") {
    // scores 0/9 normalize to p = 0/1; two docs each. Perfectly
    // calibrated: brier = rel = 0, res = unc = 0.25. Inverting the
    // labels flips rel to 1.0 (brier = rel - res + unc exactly).
    def df(swap: Boolean) = Seq(
      (1L, 0L, if (swap) "en" else "de"), (2L, 0L, if (swap) "en" else "de"),
      (3L, 9L, if (swap) "de" else "en"), (4L, 9L, if (swap) "de" else "en"))
      .toDF("doc_id", "n_chars", "lang")
    val good = Features.brierDecomposition(df(swap = false)).collect().head
    assert((good.getLong(0), good.getLong(1)) == (4L, 2L))
    assert((good.getDouble(2), good.getDouble(3), good.getDouble(4),
      good.getDouble(5)) == (0.0, 0.0, 0.25, 0.25))
    val bad = Features.brierDecomposition(df(swap = true)).collect().head
    assert((bad.getDouble(2), bad.getDouble(3), bad.getDouble(4),
      bad.getDouble(5)) == (1.0, 1.0, 0.25, 0.25))
  }
}
