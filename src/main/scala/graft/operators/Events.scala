package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table operators: sessionization and time-window aggregation.
  * One shuffle each (on user_id / on the group keys); window timestamps
  * are emitted as formatted strings so the DuckDB oracle (which reads the
  * parquet ns-timestamps natively) hash-matches Spark's µs truncation.
  */
object Events {

  /** Gap-based sessionization: a new session starts once the gap EXCEEDS
    * `gapMinutes` (gap > threshold ⇒ new session). This matches Spark's
    * native session_window exactly: an event landing precisely at the
    * session end (gap == threshold) still merges — verified empirically
    * in EventsSpec's boundary test. Single shuffle on user_id; two window
    * passes over the same partitioning (Catalyst reuses the sort). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val flagged = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
  }

  /** Per-user session stats. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id")
      .agg(max("session_id").as("n_sessions"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("user_id")

  /** Tumbling-window aggregation via Spark's window() operator; the window
    * start is formatted as a string for oracle stability. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("hour", "event_type")

  /** Per-session rows via Spark's native session_window operator (gap-
    * merged event-time windows) — the idiomatic form of sessionization;
    * oracle-checked against the explicit lag/running-sum derivation. */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  /** Semi-structured props handling: parse the JSON payload column with a
    * schema (codegen'd from_json — no UDF) and aggregate on a field. */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Top-k users by total value — agg then TakeOrdered (no global sort). */
  def topUsers(events: DataFrame, k: Int = 20): DataFrame =
    events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(k)
}
