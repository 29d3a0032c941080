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
}
