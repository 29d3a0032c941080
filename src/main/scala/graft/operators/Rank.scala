package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Caches._

/** Distributed exact ranking WITHOUT a single-partition window — the
  * shared two-level-scan helper behind every "global order over a
  * dimension table" readout (pareto concentration, RFM quintiles,
  * equi-depth histograms).
  *
  * Shape (the q34_equidepth machinery, factored): tag each row with a
  * COARSE CELL aligned with the leading sort key, fold the corpus to
  * per-cell counts, compute each cell's prefix offset, broadcast the
  * offsets back, and row_number WITHIN each cell — global_rank =
  * cell_offset + local_rank is exact while every shuffle stays
  * value-partitioned. The cell-grid prefix itself is a TRIANGULAR
  * BROADCAST JOIN (Σ over strictly-smaller cells), not a window: the
  * grid is value-domain-bounded (price cells, day cells, count
  * buckets), so cells² stays trivially small and the whole plan runs
  * with ZERO unpartitioned windows — `WindowExec: No Partition
  * Defined` never fires.
  *
  * Correctness contract: `cell` must be monotone NON-DECREASING along
  * `order` (rows in a smaller cell sort strictly before rows in a
  * larger one), and `order` must be a TOTAL order (unique tie-break) —
  * the same contract the single-window form needs for determinism. */
object Rank {

  /** Per-cell exclusive prefix offsets of (count, measure) plus the
    * 1-row grand total — both built from ONE cell-domain-sized count
    * table (persisted: it is tiny and read twice). */
  private def offsets(tagged: DataFrame,
      measure: Column): (DataFrame, DataFrame) = {
    val counts = tagged.groupBy("__cell")
      .agg(count(lit(1)).as("__cnt"), sum(measure).as("__msum"))
      .persistTracked()
    val off = counts.as("a")
      .join(broadcast(counts.as("p")), col("p.__cell") < col("a.__cell"), "left")
      .groupBy(col("a.__cell").as("__cell"))
      .agg(coalesce(sum(col("p.__cnt")), lit(0L)).as("__off"),
        coalesce(sum(col("p.__msum")), lit(0L)).as("__moff"))
    val tot = counts.agg(sum("__cnt").as("__n_total"))
    (off, tot)
  }

  /** Adds `rkName` = exact global row_number along `order` and
    * `cumName` = exact global running sum of `measure` (inclusive,
    * ROWS semantics — ties resolved by the total order). */
  def rankedCumSum(df: DataFrame, cell: Column, order: Seq[Column],
      measure: Column, rkName: String = "rk",
      cumName: String = "cum"): DataFrame = {
    // persist the tagged input: the offsets aggregate AND the main
    // join both read it, and CHAINED rank passes (the RFM triple)
    // would otherwise replay each other's full plans multiplicatively
    val tagged = df.withColumn("__cell", cell).persistTracked()
    val (off, _) = offsets(tagged, measure)
    val wIn = Window.partitionBy("__cell").orderBy(order: _*)
    tagged.join(broadcast(off), Seq("__cell"))
      .withColumn(rkName, col("__off") + row_number().over(wIn))
      .withColumn(cumName, col("__moff") + sum(measure).over(
        wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__cell", "__off", "__moff")
  }

  /** Adds `outName` = exact NTILE(`b`) along `order` — bit-identical
    * to the single-window `ntile(b)` (first n%b tiles hold ⌈n/b⌉
    * rows), computed from the distributed rank. */
  def ntileExact(df: DataFrame, cell: Column, order: Seq[Column],
      b: Int, outName: String): DataFrame =
    ntileExactBy(df, lit(1L), cell, order, b, outName)

  /** Grouped variant: exact NTILE(`b`) WITHIN each `grp` along
    * `order` — many independent rank problems in ONE two-level scan.
    * This is what keeps a multi-score readout (the RFM triple) at one
    * pass of fixed overhead instead of one pass PER score: stack the
    * problems with a tag column, call once, pivot back. Offsets and
    * totals become (grp × cell)- and grp-domain tables — still
    * broadcastable; the within-cell window partitions by (grp, cell). */
  def ntileExactBy(df: DataFrame, grp: Column, cell: Column,
      order: Seq[Column], b: Int, outName: String): DataFrame = {
    val tagged = df.withColumn("__grp", grp).withColumn("__cell", cell)
      .persistTracked() // see rankedCumSum
    val counts = tagged.groupBy("__grp", "__cell")
      .agg(count(lit(1)).as("__cnt")).persistTracked()
    val off = counts.as("a")
      .join(broadcast(counts.as("p")),
        col("p.__grp") === col("a.__grp") && col("p.__cell") < col("a.__cell"),
        "left")
      .groupBy(col("a.__grp").as("__grp"), col("a.__cell").as("__cell"))
      .agg(coalesce(sum(col("p.__cnt")), lit(0L)).as("__off"))
    val tot = counts.groupBy("__grp").agg(sum("__cnt").as("__n_total"))
    val wIn = Window.partitionBy("__grp", "__cell").orderBy(order: _*)
    tagged.join(broadcast(off), Seq("__grp", "__cell"))
      .join(broadcast(tot), Seq("__grp"))
      .withColumn("__rk", col("__off") + row_number().over(wIn))
      .withColumn("__big", expr(s"__n_total DIV $b"))
      .withColumn("__rem", expr(s"__n_total % $b"))
      .withColumn(outName,
        when(col("__rk") <= col("__rem") * (col("__big") + 1),
          expr("(__rk - 1) DIV (__big + 1)") + 1)
          .otherwise(col("__rem")
            + expr("(__rk - 1 - __rem * (__big + 1)) DIV __big") + 1)
          .cast("long"))
      .drop("__grp", "__cell", "__off", "__rk", "__n_total", "__big", "__rem")
  }
}
