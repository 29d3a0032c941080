package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML feature-engineering operators — the transform step between the
  * curated tables and a trainer. kiara's pipeline modules cover the
  * onboarding/transform surface (/root/reference/src/kiara/modules);
  * these are the feature transforms a tabular-ML user of that surface
  * runs at scale, re-expressed as single-pass Spark folds plus
  * broadcast join-backs (the hashed-feature / binning siblings live in
  * TextOps.hashedLr and Relational.q34Equidepth).
  */
object Features {

  /** Smoothed LEAVE-ONE-OUT target encoding — the high-cardinality
    * categorical encoder that avoids self-leakage: each row's category
    * mean EXCLUDES the row itself, shrunk toward the global mean with
    * pseudo-count `smoothing`:
    *
    *   te(row) = ((S_cat − y_row) + m·μ) / ((n_cat − 1) + m)
    *
    * The target is l_quantity — small integers whose double sums are
    * EXACT, so the per-row encoded value is a deterministic float both
    * engines compute bit-identically (a float-summed target would make
    * the per-row projection accumulation-order-dependent).
    *
    * Scale shape: ONE category fold (cnt, sum) + ONE global 1-row
    * aggregate, both broadcast back onto the (deterministically
    * sampled) row side — the fact table is never shuffled; the sample
    * predicate prunes the output, not the statistics. */
  def targetEncodeLoo(lineitem: DataFrame, smoothing: Double = 50.0,
      sampleMod: Long = 1000L): DataFrame = {
    val stats = lineitem.groupBy(col("l_returnflag").as("cat"))
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("s"))
    val overall = lineitem.agg(
      (sum("l_quantity") / count(lit(1)).cast("double")).as("mu"))
    lineitem
      .filter(col("l_orderkey") % sampleMod === 0)
      .select(col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_returnflag").as("cat"), col("l_quantity"))
      .join(broadcast(stats), "cat")
      .crossJoin(broadcast(overall))
      .select(col("l_orderkey"), col("l_linenumber"), col("cat"),
        col("l_quantity"),
        Num.pround(
          ((col("s") - col("l_quantity")) + lit(smoothing) * col("mu"))
            / ((col("cnt").cast("double") - 1.0) + lit(smoothing)), 4)
          .as("te_loo"))
      .orderBy("l_orderkey", "l_linenumber")
  }
}
