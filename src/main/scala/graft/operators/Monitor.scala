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
