package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical monitoring operators — the "did the metric change, and
  * when?" family that sits beside the distributional audits in
  * [[DataQuality]] (kiara analogue: metadata/quality profiling over
  * onboarded tables, /root/reference/src/kiara/models/values/
  * value_metadata.py; these are the table-level monitors a pipeline
  * runs per load).
  */
object Monitor {

  /** Offline change-point detection via the CUSUM statistic: for each
    * group's daily mean series, S_t = Σ_{i≤t}(x̄_i − μ) (cumulative
    * deviation from the series mean); the change-point estimate is the
    * day maximizing |S_t| — the classic single-shift estimator (Page's
    * CUSUM in its offline form; μ re-centers so S ends at ~0 and peaks
    * where the level shifts).
    *
    * Scale shape: ONE corpus fold to the (group × day) grid, then all
    * window work (series mean, ordered prefix sum, argmax) runs over
    * that domain-sized grid partitioned by group — nothing corpus-sized
    * is sorted. Prefix sums evaluate in day order on any engine, so the
    * float accumulation ORDER is deterministic; |S| is rounded to 4dp
    * BEFORE the argmax so a final-ulp difference cannot flip which day
    * wins (day ascending breaks exact ties).
    */
  def cusumChangePoint(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value"))
      .groupBy("event_type", "day").agg(avg("value").as("x"))
    val byType = Window.partitionBy("event_type")
    val prefix = byType.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("mu", avg("x").over(byType))
      .withColumn("s", sum(col("x") - col("mu")).over(prefix))
      .withColumn("s_abs", round(abs(col("s")), 4))
      .withColumn("n_days", count(lit(1)).over(byType))
    scored
      .withColumn("rn", row_number().over(
        byType.orderBy(col("s_abs").desc, col("day").asc)))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("cp_day"), col("s_abs"),
        col("n_days"))
      .orderBy("event_type")
  }

  /** Kaplan-Meier survival estimate over user lifetimes — the
    * retention curve that handles CENSORING correctly (users still
    * active at the observation edge haven't churned; naive retention
    * counts them as losses and biases the curve down). Lifetime =
    * whole days between a user's first and last event; a user is
    * censored when their last event lies within `censorDays` of the
    * corpus's observation edge. S(t) = Π_{d≤t} (1 − churn_d/at-risk_d)
    * over distinct lifetimes d, the product via exp(Σ ln(..)) under an
    * ordered prefix window (deterministic accumulation; S rounds 4dp;
    * an exhausted risk set would take ln(0), which Spark nulls and
    * DuckDB -infs — both sides emit 0 explicitly through the same
    * guard instead).
    *
    * Scale shape: one shuffle folds events to the user dimension
    * (first/last ts), the observation edge is a broadcast 1-row
    * aggregate, and ALL curve algebra (risk sets from a cumulative
    * window, the log-sum product) runs on the distinct-lifetime table
    * — day-domain-sized, never user- or event-sized. */
  def kaplanMeier(events: DataFrame, censorDays: Int = 3): DataFrame = {
    val users = events.groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
    val edge = users.agg(max("last_us").as("edge_us"))
    val dayUs = 86400000000L
    val lifetimes = users.crossJoin(broadcast(edge)) // bounded: 1 row
      .select(floor((col("last_us") - col("first_us")) / dayUs).cast("long").as("t"),
        (col("edge_us") - col("last_us") >= censorDays * dayUs).as("churned"))
    val byT = lifetimes.groupBy("t")
      .agg(sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leaving"))
    val w = Window.orderBy("t") // distinct-lifetime domain: bounded window
    val curve = byT
      .withColumn("n_risk",
        sum("leaving").over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("frac",
        lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
      .withColumn("s",
        when(min("frac").over(w.rowsBetween(Window.unboundedPreceding, 0)) <= 0.0,
          lit(0.0))
          .otherwise(exp(sum(log(col("frac")))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))))
    curve.select(col("t"), col("n_risk"), col("d").as("n_churned"),
        round(col("s"), 4).as("survival"))
      .orderBy("t")
  }

  /** Robust outlier screen via the median absolute deviation — the
    * detector that still works when the outliers themselves have
    * wrecked mean and stddev (the z-score blind spot,
    * [[graft.operators.Events.valueAnomalies]]): flag rows with
    * |x − med| > k · 1.4826 · MAD (1.4826 scales MAD to σ under
    * normality, k=3 is the standard cut).
    *
    * Scale shape: two grouped EXACT percentile aggregates (median, then
    * median of deviations) — each one shuffle over the corpus with a
    * dimension-sized result broadcast back — and a final conditional
    * aggregate for the counts. Exact medians are the oracle-checkable
    * choice at gate scale; the 100 TB variant swaps in the mergeable
    * KLL sketch ([[org.apache.spark.sql.graftext.KllSketchAgg]])
    * without changing the algebra. */
  def madOutliers(events: DataFrame, k: Double = 3.0): DataFrame = {
    val med = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"), count(lit(1)).as("n"))
    // dev feeds BOTH the MAD aggregate and the final flag count — persist
    // it (spilling) so the two-level median costs two corpus scans, not
    // four (the self-join recompute rule)
    val dev = events.select(col("event_type"), col("value"))
      .join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(max("n").as("n"), max("med").as("med0"), max("mad").as("mad0"),
        sum(when(col("dev") > lit(k) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"),
        round(col("med0"), 4).as("med"), round(col("mad0"), 4).as("mad"),
        col("n_outliers"),
        (floor(col("n_outliers").cast("double") / col("n").cast("double")
          * 10000.0 + 0.5) / 10000.0).as("outlier_rate"))
      .orderBy("event_type")
  }
}
