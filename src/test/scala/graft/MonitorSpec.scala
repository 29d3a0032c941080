package graft

import org.apache.spark.sql.functions._
import graft.operators.{CountMin, Monitor}

class MonitorSpec extends SparkTestBase {
  import spark.implicits._

  test("cusumChangePoint finds a planted level shift at its last pre-shift day") {
    // mean 10 for days 01..10, mean 30 for days 11..20: series mean is
    // 20, so S_t = -10t falls to its extreme |S| = 100 exactly at day
    // 10 (the last day of the old regime), then climbs back to 0
    val rows = (1 to 20).flatMap { d =>
      val v = if (d <= 10) 10.0 else 30.0
      Seq((f"2024-02-$d%02d 12:00:00", "a", v))
    }
    val ev = rows.toDF("ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = Monitor.cusumChangePoint(ev).head()
    assert((r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)) ==
      (("a", "2024-02-10", 100.0, 20L)))
  }

  test("madOutliers flags the planted spike that a wrecked stddev would hide") {
    // 19 values in [9,11] plus one at 1000: med≈10, MAD≈1, so the spike
    // is an outlier by MAD — while mean≈59.5 / sd≈221 puts its z at
    // only ~4.2σ of a distribution the spike itself inflated
    val vals = (1 to 19).map(i => 9.0 + (i % 3)) :+ 1000.0
    val ev = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "a", v) }.toDF("event_id", "event_type", "value")
    val r = Monitor.madOutliers(ev).head()
    assert(r.getString(0) == "a" && r.getLong(1) == 20L)
    assert(r.getLong(4) == 1L, s"exactly the planted spike must flag: $r")
  }

  test("kaplanMeier: censored users hold the curve, churners drop it — hand computation") {
    // edge = day 10 (u4's last). u1: days 0-2 (churned, 10-2≥3);
    // u2: 1-3 (churned); u3: 0-8 (last 2 days from edge → CENSORED);
    // u4: 0-10 (at the edge → censored). Lifetimes: u1 t=2, u2 t=2,
    // u3 t=8, u4 t=10. Risk sets 4/2/1; S = (1-2/4) = 0.5 then flat —
    // censoring removes u3/u4 from risk WITHOUT dropping survival.
    val rows = Seq(
      (1L, 1L, 0), (2L, 1L, 2), (3L, 2L, 1), (4L, 2L, 3),
      (5L, 3L, 0), (6L, 3L, 8), (7L, 4L, 0), (8L, 4L, 10))
    val ev = rows.map { case (e, u, day) =>
      (e, u, f"2024-03-${day + 1}%02d 12:00:00") }
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Monitor.kaplanMeier(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((2L, 4L, 2L, 0.5), (8L, 2L, 0L, 0.5), (10L, 1L, 0L, 0.5)))
  }

  test("ksTest: hand ECDFs — D = 0.5 attained first at the earliest gap bin") {
    // a: bins {5,15,25,35}, b: bins {25,35,45,55}; the ECDF gap peaks
    // at 0.5 from bin 15 through 35 — argmax ties break to the LOWEST
    // bin, so both rows must report d_at_bin = 15
    val rows = Seq(0.5, 1.5, 2.5, 3.5).map(("a", _)) ++
      Seq(2.5, 3.5, 4.5, 5.5).map(("b", _))
    val ev = rows.toDF("event_type", "value")
    val out = Monitor.ksTest(ev).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getLong(4), r.getBoolean(6)))
    // n=8, n_a=4: crit = 1.3581·√(8/16) ≈ 0.9603 > 0.5 → no reject
    assert(out.toSeq == Seq(("a", 0.5, 15L, false), ("b", 0.5, 15L, false)))
  }

  test("mannWhitney: textbook no-tie U and the tie-corrected σ, by hand") {
    // a={.1,.2}, b={.3,.4}: ranks 1..4, R_a=3, U=0,
    // z = −2/√(4/12·5) = −1.5492
    val clean = (Seq(0.1, 0.2).map(("a", _)) ++ Seq(0.3, 0.4).map(("b", _)))
      .toDF("event_type", "value")
    val c = Monitor.mannWhitney(clean).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap.apply("a")
    assert(c == ((0.0, -1.5492)))
    // a={.1,.2}, b={.1,.3}: bin 1 is TIED (c=2, midrank 1.5) →
    // R_a = 1.5+3 = 4.5, U = 1.5; T = 2³−2 = 6,
    // σ² = 4/12·(5 − 6/12) = 1.5, z = −0.5/√1.5 = −0.4082
    val tied = (Seq(0.1, 0.2).map(("a", _)) ++ Seq(0.1, 0.3).map(("b", _)))
      .toDF("event_type", "value")
    val t = Monitor.mannWhitney(tied).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap.apply("a")
    assert(t == ((1.5, -0.4082)))
  }

  test("ewmaChart: exact power-of-two weights by hand; a planted spike signals") {
    def ev(day: Int, v: Double, ty: String = "a") =
      (f"2024-04-$day%02d 12:00:00", ty, v)
    // series 10,10,10,30 with α=1/2: e = 10, 10, 10, 20 exactly
    val s1 = Seq(ev(1, 10.0), ev(2, 10.0), ev(3, 10.0), ev(4, 30.0))
      .toDF("ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val e1 = Monitor.ewmaChart(s1).collect().map(_.getDouble(3)).toSeq
    assert(e1 == Seq(10.0, 10.0, 10.0, 20.0))
    // nine 10s then 1000: |e10 − μ| = 396 crosses the L=1 limit (~181)
    // but NOT the default L=3 — the chart width matters
    val s2 = ((1 to 9).map(d => ev(d, 10.0)) :+ ev(10, 1000.0))
      .toDF("ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    assert(Monitor.ewmaChart(s2, l = 1.0).collect().map(_.getBoolean(6)).toSeq
      == (Seq.fill(9)(false) :+ true))
    assert(!Monitor.ewmaChart(s2).collect().map(_.getBoolean(6)).contains(true))
  }

  test("powerAnalysis: hand n-per-arm from the normal approximation") {
    // μ=10, s²=20/19: n/arm = ceil(2·(1.96+0.8416)²·s²/(0.5)²) = 67
    val ev = (1 to 10).flatMap(_ => Seq(9.0, 11.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, "a", v) }
      .toDF("event_id", "event_type", "value")
    val r = Monitor.powerAnalysis(ev).head()
    assert((r.getLong(1), r.getDouble(2), r.getLong(4), r.getBoolean(5)) ==
      ((20L, 10.0, 67L, false)))
  }

  test("count-min: estimates never undercount, and are exact without collisions") {
    val keys = (Seq.fill(7)("x") ++ Seq.fill(3)("y") ++ Seq("z")).toDF("term")
    val grid = CountMin.sketch(keys, "term", d = 3, w = 64)
    val probes = Seq(("x", 7L), ("y", 3L), ("z", 1L)).toDF("term", "n_true")
    val est = CountMin.estimate(grid, probes, d = 3, w = 64)
      .join(probes, "term").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    est.foreach { case (t, (e, tr)) => assert(e >= tr, s"$t undercounted: $e < $tr") }
    // 3 keys in 64 buckets × 3 depths: min over depths collides with
    // probability ~(3/64)^3 — this fixed dataset has none, so exact
    assert(est.forall { case (_, (e, tr)) => e == tr })
    // grid never exceeds d×w cells and total per depth preserves N
    val byDepth = grid.groupBy("depth").agg(sum("cnt").as("s")).collect()
    assert(byDepth.forall(_.getLong(1) == 11L), "each depth row must hold all N updates")
  }

  test("nelsonAalen: hand-computed cumulative hazard on the KM fixture") {
    // same frame as the kaplanMeier test: lifetimes t=2 (2 churned),
    // t=8 (censored), t=10 (censored); risk sets 4/2/1.
    // h = 2/4, 0, 0 -> H = 0.5 flat; V = 2/16 -> se = sqrt(0.125)
    val rows = Seq(
      (1L, 1L, 0), (2L, 1L, 2), (3L, 2L, 1), (4L, 2L, 3),
      (5L, 3L, 0), (6L, 3L, 8), (7L, 4L, 0), (8L, 4L, 10))
    val ev = rows.map { case (e, u, day) =>
      (e, u, f"2024-03-${day + 1}%02d 12:00:00") }
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Monitor.nelsonAalen(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(out == Seq((2L, 4L, 2L, 0.5, 0.3536),
      (8L, 2L, 0L, 0.5, 0.3536), (10L, 1L, 0L, 0.5, 0.3536)))
  }
}
