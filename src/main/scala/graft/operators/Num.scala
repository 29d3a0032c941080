package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Partition-count sizing from the optimizer's size ESTIMATE — the
  * explicit, scale-adaptive replacement for what AQE's partition
  * coalescing did implicitly before the harness turned AQE off for
  * short queries (r16): a write (or an iterative consumer like GraphX
  * LDA) should see partitions sized to the DATA, not to
  * spark.sql.shuffle.partitions. coalesce (no shuffle): at gate SFs
  * the estimate is KBs → 1 partition/file; at cluster scale the
  * estimate exceeds target × current partitions → no-op. Estimates
  * can be off by a constant factor, which moves file sizes — never
  * correctness. */
object Sizing {
  def byEstimate(df: org.apache.spark.sql.DataFrame,
      targetBytes: Long = 128L * 1024 * 1024): org.apache.spark.sql.DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val cur = df.rdd.getNumPartitions
    val want = math.max(1L, math.min(cur.toLong,
      (est / BigInt(targetBytes)).toLong + 1L)).toInt
    if (want < cur) df.coalesce(want) else df
  }
}

object Num {
  /** Portable round-to-dp: floor(x·10^dp + 0.5)/10^dp with identical IEEE
    * ops in Spark and DuckDB. Plain round() disagrees between the engines
    * on half-boundaries (Spark rounds the shortest decimal string, DuckDB
    * rounds the binary double) — which small-integer ratios like jaccard
    * 7/160 actually hit. Oracle SQL must use the same formula. */
  def pround(c: Column, dp: Int): Column = {
    val f = math.pow(10, dp)
    floor(c * f + 0.5).cast("double") / f
  }
}
