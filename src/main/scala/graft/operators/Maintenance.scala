package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators — the housekeeping a 100 TB lakehouse
  * actually schedules. Streaming ingest and per-batch writes leave
  * thousands of small parquet files; every downstream scan then pays
  * per-file open/footer costs and loses row-group-sized reads.
  * Compaction rewrites a directory into target-sized files — run it as
  * a periodic job and every later query reads fewer, bigger files.
  */
object Maintenance {

  final case class CompactionStats(filesBefore: Long, filesAfter: Long, rows: Long)

  /** Rewrite `srcDir` into `destDir` with ~`targetRecordsPerFile` rows
    * per file. Row count comes from parquet FOOTERS (no data scan) to
    * size the rewrite; the write itself is one distributed pass.
    * Contents are preserved exactly — only the file layout changes. */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
              targetRecordsPerFile: Long): CompactionStats = {
    import graft.registries.ParquetMeta
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be positive")
    val rows = ParquetMeta.dirRowCount(srcDir)
    val files = math.max(1L, (rows + targetRecordsPerFile - 1) / targetRecordsPerFile)
    // repartition takes an Int; a silent .toInt would wrap exactly at the
    // scale this operator exists for
    require(files <= Int.MaxValue,
      s"compaction would need $files files ($rows rows at $targetRecordsPerFile/file); " +
        "raise targetRecordsPerFile")
    spark.read.parquet(srcDir)
      .repartition(files.toInt)
      .write.mode("errorifexists").parquet(destDir)
    CompactionStats(ParquetMeta.dirFileCount(srcDir), ParquetMeta.dirFileCount(destDir), rows)
  }

  final case class EraseStats(filesTotal: Long, filesRewritten: Long,
                              rowsErased: Long)

  /** Surgical key deletion (the right-to-be-forgotten rewrite): delete
    * every row whose `keyCol` is in `ids`, rewriting ONLY the part-files
    * whose footer [min,max] range can contain a target id — untouched
    * files are copied byte-for-byte (at scale: hard-linked / retained by
    * a manifest swap, zero IO). On a clustered layout
    * ([[Layout.clusterWrite]]: disjoint per-file key ranges) erasing a
    * handful of keys rewrites a handful of files out of thousands; the
    * footer check is the SAME metadata the planner's file skipping uses,
    * applied to writes. Copy-on-write into `destDir` — the source stays
    * intact for snapshot/rollback layering. */
  def erase(spark: SparkSession, srcDir: String, destDir: String,
            keyCol: String, ids: Seq[Long]): EraseStats = {
    import graft.registries.ParquetMeta
    import org.apache.spark.sql.functions.col
    require(ids.nonEmpty, "erase with no ids is a no-op; refuse to rewrite")
    val dest = java.nio.file.Paths.get(destDir)
    java.nio.file.Files.createDirectories(dest)
    val ranges = ParquetMeta.fileRanges(srcDir, keyCol)
    val (touched, untouched) = ranges.partition { case (_, mn, mx) =>
      ids.exists(id => id >= mn && id <= mx)
    }
    untouched.foreach { case (f, _, _) =>
      val p = java.nio.file.Paths.get(f)
      java.nio.file.Files.copy(p, dest.resolve(p.getFileName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    var erased = 0L
    if (touched.nonEmpty) {
      val src = spark.read.parquet(touched.map(_._1): _*)
      erased = src.filter(col(keyCol).isin(ids: _*)).count()
      // one output file per rewritten input keeps the clustered layout's
      // disjoint ranges intact for the NEXT surgical pass
      src.filter(!col(keyCol).isin(ids: _*))
        .repartition(touched.size)
        .write.mode("append").parquet(destDir)
    }
    EraseStats(ranges.size.toLong, touched.size.toLong, erased)
  }

  /** Incremental aggregate-view maintenance: merge a new batch's partial
    * aggregate STATE into the existing materialized state without
    * rescanning the base data — the delta pattern that makes daily
    * aggregates over a 100 TB fact table cost O(batch), not O(history).
    * Works because count/sum are mergeable (avg and friends derive from
    * them at READ time); the merge is one key-aligned full-outer join of
    * two aggregate-sized tables.
    *
    * State schema: (key, n BIGINT, s DOUBLE). `aggState` builds it from
    * raw rows; `mergeState` combines two states; `readView` derives the
    * user-facing view (count, rounded sum, derived avg).
    */
  def aggState(rows: org.apache.spark.sql.DataFrame, key: String, valueCol: String)
      : org.apache.spark.sql.DataFrame =
    rows.groupBy(key).agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"))

  def mergeState(base: org.apache.spark.sql.DataFrame, delta: org.apache.spark.sql.DataFrame,
                 key: String): org.apache.spark.sql.DataFrame =
    base.select(col(key), col("n").as("n_a"), col("s").as("s_a"))
      .join(delta.select(col(key), col("n").as("n_b"), col("s").as("s_b")), Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L))).as("n"),
        (coalesce(col("s_a"), lit(0.0)) + coalesce(col("s_b"), lit(0.0))).as("s"))

  def readView(state: org.apache.spark.sql.DataFrame, key: String)
      : org.apache.spark.sql.DataFrame =
    state.select(col(key), col("n"), round(col("s"), 2).as("total"),
        round(col("s") / col("n"), 4).as("avg_value"))
      .orderBy(key)

  /** Idempotent partitioned load — the exactly-once BATCH sink. Writing
    * with DYNAMIC partition overwrite makes a load replace exactly the
    * partitions its batch touches and nothing else, so re-running a
    * batch after a partial failure (the routine 1000-executor incident)
    * converges to the same table instead of duplicating rows. This is
    * the batch twin of the streaming checkpoint story: retries are
    * free because the write is a partition-valued PUT, not an append.
    * Scoped via a writer OPTION, not session config — concurrent loads
    * with other overwrite modes are unaffected.
    */
  def idempotentLoad(df: DataFrame, destDir: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(destDir)

  /** CDC MERGE — fold a change batch into a keyed base table (the SQL
    * `MERGE INTO` / Debezium-sink primitive; kiara's store-backed value
    * update analogue). `changes` rows are (key, seq, op, payload...):
    * op `"U"` upserts (update when the key exists, insert when it
    * doesn't), op `"D"` deletes (a no-op for absent keys). When the
    * batch carries several changes for one key the HIGHEST `seqCol`
    * wins — the standard log-offset latest-wins rule; `seqCol` must be
    * unique per key (ties would make the survivor engine-dependent).
    *
    * Scale shape: the latest-wins dedup is one BATCH-sized shuffle
    * (`max_by` keeps it a single aggregate, no window sort), then ONE
    * full-outer join on the key — base-side exchange-free when the base
    * is bucketed on the key ([[graft.sources.Bucketing]]), and the
    * batch side is the small one at 100 TB. Never O(base) beyond the
    * single co-partitioned pass, and nothing collects.
    */
  /** SCD Type-2 dimension history — turn a change stream into the
    * warehouse-standard versioned dimension: one row per (key, attribute
    * value) EPISODE with half-open `[valid_from, valid_to)` validity,
    * `is_current` on the open episode, and a per-key version number.
    * [[cdcMerge]] is SCD-1 (overwrite, history lost); this keeps every
    * state an entity passed through — the "what did we believe about
    * this customer on March 3rd" query. A new version opens only when
    * the tracked attribute actually CHANGES (consecutive identical
    * values collapse into one episode, the textbook SCD-2 rule).
    *
    * Scale shape: ONE shuffle on the key; the change-detect lag, the
    * episode lead, and the version row_number all share the same
    * (partition, order) so Spark plans one sort under all three
    * windows. Per-key state is the change count, never the fact-table
    * width. `tieCol` must make (tsCol, tieCol) unique per key or the
    * episode order would be engine-dependent.
    */
  def scd2(changes: DataFrame, key: String, tsCol: String, tieCol: String,
           attr: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieCol))
    val openers = changes
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
    val w2 = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieCol))
    openers.select(col(key), col(attr),
        date_format(col(tsCol), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(lead(col(tsCol), 1).over(w2), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        lead(col(tsCol), 1).over(w2).isNull.as("is_current"),
        row_number().over(w2).cast("long").as("version"))
      .orderBy(col(key), col("version"))
  }

  def cdcMerge(base: DataFrame, changes: DataFrame, key: String, seqCol: String,
               opCol: String, payload: Seq[String]): DataFrame = {
    val latest = changes.groupBy(col(key)).agg(
        max_by(struct(col(opCol).as("op") +: payload.map(col): _*), col(seqCol)).as("c"))
      .select(col(key) +: col("c.op").as("__op") +:
        payload.map(p => col(s"c.$p").as(s"__c_$p")): _*)
    base.join(latest, Seq(key), "full_outer")
      // base-only rows (__op null) pass through; matched 'D' rows — and
      // 'D' for keys never loaded — drop
      .filter(coalesce(col("__op"), lit("U")) =!= "D")
      .select(col(key) +: payload.map(p =>
        when(col("__op").isNotNull, col(s"__c_$p")).otherwise(col(p)).as(p)): _*)
  }
}
