package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavy-
  * tailed (a handful of keys holding most rows — the classic 100 TB
  * killer: one straggler task processing the hot key's entire partition).
  *
  * AQE's skew-join splitting (on by default in Spark 4) handles most
  * cases at runtime; `saltedJoin` is the explicit fallback for joins AQE
  * cannot split (e.g. when the skewed side must build a hash table), and
  * `keySkew` is the diagnostic that says whether either is needed.
  */
object Skew {

  /** Salted equi-join: the big side gets a deterministic salt in
    * [0, salts), derived by hashing the full row; the small side is
    * replicated once per salt. The hot key's rows then spread over
    * `salts` reducers instead of one. Result is identical to
    * big.join(small, key). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Per-key frequency diagnostic: top-k keys with row counts and their
    * share of the table — feeds the decision to salt.
    *
    * Single scan of the base table: the total is derived from the
    * already-aggregated per-key counts (a 1-row scalar, broadcast), not a
    * separate `count()` pass. Both branches share the same groupBy
    * subtree, so ReuseExchange materializes the aggregation shuffle once.
    */
  def keySkew(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val grouped = df.groupBy(key).agg(count(lit(1)).as("n_rows"))
    val total = grouped.agg(sum("n_rows").cast("double").as("__total"))
    grouped
      .orderBy(col("n_rows").desc, col(key)).limit(topK)
      .crossJoin(broadcast(total)) // bounded: exactly one scalar row
      .withColumn("share", Num.pround(col("n_rows") / col("__total"), 4))
      .drop("__total")
      .orderBy(col("n_rows").desc, col(key))
  }
}
