package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * share of the table — feeds the decision to salt. */
  def keySkew(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(key)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("share", round(col("n_rows") / lit(total.toDouble), 4))
      .orderBy(col("n_rows").desc, col(key))
      .limit(topK)
  }
}

/** Bucketed-table write path: pre-shuffling a fact table into sorted
  * buckets on its join key makes later joins between co-bucketed tables
  * exchange-free (no shuffle at query time) — the standard way to
  * amortize the big shuffle across many downstream queries at 100 TB.
  */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key — plans with zero
    * Exchange operators (asserted in SkewSpec). */
  def coBucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
