package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed write path: persist a table hash-bucketed (and sorted) on its
  * join key so repeated joins/aggregations on that key are CO-LOCATED —
  * the sort-merge join reads matching buckets pairwise and needs no
  * shuffle and no sort at query time. This is the storage-level answer to
  * the 100 TB fact-fact join: pay the partitioned write once, skip the
  * dominant Exchange on every subsequent query. (kiara's data store keeps
  * values as opaque serialized chunks — `registries/data/data_store/`;
  * a layout contract like this is what the Spark re-expression adds.)
  *
  * Spark wiring: `bucketBy` requires a catalog table (the bucket spec
  * lives in catalog metadata, not in the parquet footers), so tables are
  * registered in the session catalog with their files at an explicit
  * `path`. Readers use `spark.table(name)`.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table at `path`.
    * Buckets on a real cluster = target parallelism of downstream joins;
    * both sides of a co-located join must use the SAME bucket count. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Bucket `orders` and `lineitem` on their join key (same bucket count
    * both sides) and return the revenue-per-status join — the plan's join
    * is exchange-free: each task reads orders bucket i + lineitem bucket
    * i directly. Returns the joined aggregate. */
  def ordersLineitemJoin(orders: DataFrame, lineitem: DataFrame,
      buckets: Int = 8): DataFrame = {
    val spark = orders.sparkSession
    val base = Export.tempDir("graft_bucketed_").toString
    writeBucketed(orders, "orders_bucketed", "o_orderkey", buckets, s"$base/orders")
    writeBucketed(lineitem, "lineitem_bucketed", "l_orderkey", buckets, s"$base/lineitem")
    spark.table("orders_bucketed")
      .join(spark.table("lineitem_bucketed"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("o_orderstatus")
  }
}
