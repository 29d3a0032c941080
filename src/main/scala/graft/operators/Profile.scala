package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the Spark-native `extract_metadata` (kiara reference:
  * operations/included_core_operations/metadata.py:63 and
  * modules/included_core_modules/metadata.py:34).
  *
  * One distributed aggregation pass over the table computes every column's
  * stats at once (no per-column jobs, no data rows collected); the 1-row
  * wide result is reshaped to long form with `stack` on the driver side of
  * the plan. At 100 TB this is a single scan + a 1-row shuffle.
  */
object Profile {

  private def profileWith(df: DataFrame, cols: Seq[String],
                          ndv: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    // both the column names and their types are interpolated into a SQL
    // `stack(...)` string below, and min/max are cast to double — validate
    // up front (this path is reachable from the user-facing Cli `profile`
    // command) instead of failing with a parse/ANSI-cast error mid-query
    cols.foreach { c =>
      graft.registries.Names.validate("column name for profile", c)
      val field = df.schema.fields.find(_.name == c)
        .getOrElse(throw new IllegalArgumentException(s"no such column: $c"))
      require(field.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"profile supports numeric columns only; '$c' is ${field.dataType.simpleString}")
    }
    val aggs = Seq(count(lit(1)).as("__cnt")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        ndv(col(c)).as(s"${c}__ndv"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', __cnt, `${c}__nulls`, `${c}__min`, `${c}__max`, `${c}__ndv`")
      .mkString(", ")
    one
      .select(expr(s"stack(${cols.size}, $stackArgs) as (col_name, cnt, nulls, minv, maxv, ndv)"))
      .orderBy("col_name")
  }

  /** Per-column count / nulls / min / max / exact ndv for numeric columns. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, countDistinct(_))

  /** The 100 TB profile variant: HyperLogLog ndv (approx_count_distinct)
    * instead of exact — avoids the Expand ×(cols+1) row blowup that exact
    * multi-column count-distinct plans require. Same single scan. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, approx_count_distinct(_))

  /** The gate face of [[profileApprox]] (oracle-backed since r12, the
    * q13_approx precedent): the HLL++ ndv estimate has no cross-engine
    * twin, but its accuracy contract does (default rsd 0.05 → 15% ≈ 3σ,
    * + 4 absolute slack where linear counting makes tiny ndv near-exact).
    * Outputs the EXACT ndv (DuckDB recomputes it) plus an integer
    * verdict per column; an estimate past its bound hash-reds the gate.
    * ACCEPTED GATE COST: this face computes exact AND approx ndv in one
    * scan, re-paying the Expand ×(cols+1) blowup that [[profileApprox]]
    * exists to avoid — at 100 TB production runs the approx face alone. */
  def profileApproxVerified(df: DataFrame, cols: Seq[String]): DataFrame = {
    cols.foreach { c =>
      graft.registries.Names.validate("column name for profile", c)
      val field = df.schema.fields.find(_.name == c)
        .getOrElse(throw new IllegalArgumentException(s"no such column: $c"))
      require(field.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"profile supports numeric columns only; '$c' is ${field.dataType.simpleString}")
    }
    // r16 (guide §4/codegen): approx_count_distinct is an
    // ImperativeAggregate — mixed into the Expand/countDistinct plan it
    // knocked the WHOLE multi-distinct aggregate out of whole-stage
    // codegen (ProfileKey: ~13 CPU-seconds interpreting the 583k-group
    // merge at sf0.1). Split the HLL estimates into their own
    // single-pass aggregate over the raw rows: the exact leg (count/
    // nulls/min/max/countDistinct — all declarative) keeps full
    // codegen, and the HLL leg is 3 sketch updates per row with no
    // giant hash map. HLL registers are duplicate-insensitive
    // (register = max(ρ(hash(v))) — idempotent, merge = register max),
    // so the estimates are bit-identical to the fused plan's.
    val exactAggs = Seq(count(lit(1)).as("__cnt")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        countDistinct(col(c)).as(s"${c}__ndv"))
    }
    val hllAggs = cols.map(c => approx_count_distinct(col(c)).as(s"${c}__andv"))
    val one = df.agg(exactAggs.head, exactAggs.tail: _*)
      .crossJoin(df.agg(hllAggs.head, hllAggs.tail: _*)) // bounded: 1 row each
    val stackArgs = cols
      .map(c => s"'$c', __cnt, `${c}__nulls`, `${c}__min`, `${c}__max`, " +
        s"`${c}__ndv`, `${c}__andv`")
      .mkString(", ")
    one
      .select(expr(s"stack(${cols.size}, $stackArgs) as " +
        "(col_name, cnt, nulls, minv, maxv, ndv, andv)"))
      .select(col("col_name"), col("cnt"), col("nulls"), col("minv"),
        col("maxv"), col("ndv"),
        (abs(col("andv").cast("double") - col("ndv").cast("double"))
          <= col("ndv").cast("double") * 0.15 + 4.0)
          .cast("long").as("ndv_in_bound"))
      .orderBy("col_name")
  }

  /** String-column profile (kiara's extract_metadata covers every core
    * type, not just numerics): one distributed pass computing count,
    * nulls, exact ndv and min/max BYTE LENGTH per column — the length
    * stats replace the numeric min/max cast, so text/categorical columns
    * profile without ANSI cast errors. Same single-scan shape. */
  def profileStrings(df: DataFrame, cols: Seq[String]): DataFrame = {
    cols.foreach { c =>
      graft.registries.Names.validate("column name for profile", c)
      val field = df.schema.fields.find(_.name == c)
        .getOrElse(throw new IllegalArgumentException(s"no such column: $c"))
      require(field.dataType == org.apache.spark.sql.types.StringType,
        s"profileStrings supports string columns only; '$c' is ${field.dataType.simpleString}")
    }
    val aggs = Seq(count(lit(1)).as("__cnt")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(octet_length(col(c))).cast("long").as(s"${c}__minlen"),
        max(octet_length(col(c))).cast("long").as(s"${c}__maxlen"),
        countDistinct(col(c)).as(s"${c}__ndv"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', __cnt, `${c}__nulls`, `${c}__minlen`, `${c}__maxlen`, `${c}__ndv`")
      .mkString(", ")
    one
      .select(expr(s"stack(${cols.size}, $stackArgs) as (col_name, cnt, nulls, min_len, max_len, ndv)"))
      .orderBy("col_name")
  }

  /** Per-column Shannon entropy (bits) + distinct count — the profiling
    * signal that separates "5 well-balanced categories" from "one value
    * 99% of the time" (ndv alone can't), and flags join keys vs
    * degenerate partition keys before they become skew problems.
    *
    * ONE pass: the columns melt row-locally into (column, value) pairs
    * (explode of a literal-sized array — no extra scans per column),
    * one aggregate shuffle builds the frequency table, and the entropy
    * fold runs over that value-domain-sized table, never the data.
    * Entropy is a float aggregate → round(…, 4) on both engines (the
    * repo's aggregate-rounding rule). */
  def columnEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cols.nonEmpty, "need at least one column")
    val melted = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("kv"))
      .select(col("kv.c").as("col_name"), col("kv.v").as("v"))
    val freq = melted.groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
    val n = Window.partitionBy("col_name")
    freq.withColumn("p", col("cnt").cast("double") / sum("cnt").over(n))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_distinct"),
        round(-sum(col("p") * log(2.0, col("p"))), 4).as("entropy_bits"))
      .orderBy("col_name")
  }

  /** Schema metadata as a DataFrame (name, type, nullable). */
  def schemaOf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))
      .toDF("col_name", "data_type", "nullable")
  }
}
