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

  private val written = scala.collection.concurrent.TrieMap[(String, Int), String]()

  /** Bucket `orders` and `lineitem` from `dir` on their join key (same
    * bucket count both sides) and return the revenue-per-status join —
    * the plan's join is exchange-free: each task reads orders bucket i +
    * lineitem bucket i directly.
    *
    * The bucketed write happens ONCE per (dir, buckets) per JVM (that is
    * the production shape: pay the layout once, amortize over every
    * downstream join — repeated bench/spec runs reuse the tables instead
    * of rewriting gigabytes into fresh temp dirs). Table names carry the
    * source-dir hash so two scale factors in one JVM don't clobber each
    * other's catalog entries. */
  def ordersLineitemJoin(spark: org.apache.spark.sql.SparkSession, dir: String,
      buckets: Int = 8): DataFrame = {
    val tag = s"${Integer.toHexString(dir.hashCode & 0x7fffffff)}_$buckets"
    val (ordersTbl, lineitemTbl) = (s"orders_bucketed_$tag", s"lineitem_bucketed_$tag")
    written.getOrElseUpdate((dir, buckets), {
      val base = Export.tempDir("graft_bucketed_").toString
      writeBucketed(graft.Tables.t(spark, dir, "orders"),
        ordersTbl, "o_orderkey", buckets, s"$base/orders")
      writeBucketed(graft.Tables.t(spark, dir, "lineitem"),
        lineitemTbl, "l_orderkey", buckets, s"$base/lineitem")
      base
    })
    spark.table(ordersTbl)
      .join(spark.table(lineitemTbl),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("o_orderstatus")
  }
}
