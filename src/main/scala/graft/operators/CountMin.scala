package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch as RELATIONAL state — the point-query frequency
  * summary that completes the sketch family (KLL ranks, HLL/theta
  * distincts, Misra-Gries heavy hitters, bloom membership): estimate
  * ANY item's stream count from a fixed d×w counter grid, guaranteed
  * n_true ≤ n_est ≤ n_true + εN with ε = e/w (Cormode & Muthukrishnan
  * 2005). The n-gram-LM use case is the 100 TB motivation: approximate
  * n-gram counts over a corpus whose exact vocabulary can't be
  * shuffled.
  *
  * Spark-first shape: the sketch IS a grouped count — explode each key
  * into its d (depth, bucket) cells and fold with ONE shuffle into the
  * d×w grid (map-side partials make every partition's contribution a
  * ≤d×w partial sketch — the classic mergeability, delivered by the
  * engine's own partial aggregation rather than hand-rolled state).
  * Probing joins the domain-sized grid and takes min over depths.
  * Buckets come from md5 (engine-portable), so a DuckDB oracle can
  * replay the ENTIRE sketch and the estimates match exactly — the
  * counter grid is deterministic state, like every sketch in this
  * repo.
  */
object CountMin {

  private def bucket(term: org.apache.spark.sql.Column,
                     depth: org.apache.spark.sql.Column, w: Int) =
    conv(substring(md5(concat(depth.cast("string"), lit("|"), term)), 1, 8),
      16, 10).cast("long") % w

  /** Fold a key column into the d×w counter grid: (depth, bucket, cnt). */
  def sketch(keys: DataFrame, keyCol: String, d: Int = 3, w: Int = 64): DataFrame = {
    val depths = explode(array((0 until d).map(lit): _*)).as("depth")
    keys.select(col(keyCol).as("term"), depths)
      .select(col("depth"), bucket(col("term"), col("depth"), w).as("bucket"))
      .groupBy("depth", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-query estimates for `probes` (a (term) frame): min over the
    * d cells each probe hashes into. The grid side is domain-sized
    * (d×w) and broadcastable; probing never rescans the stream. */
  def estimate(grid: DataFrame, probes: DataFrame, d: Int = 3, w: Int = 64): DataFrame = {
    val depths = explode(array((0 until d).map(lit): _*)).as("depth")
    probes.select(col("term"), depths)
      .withColumn("bucket", bucket(col("term"), col("depth"), w))
      .join(broadcast(grid), Seq("depth", "bucket"))
      .groupBy("term").agg(min("cnt").as("n_est"))
  }
}
