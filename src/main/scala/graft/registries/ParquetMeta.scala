package graft.registries

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Footer-only parquet metadata reads for the info surfaces
  * (kiara_api.py:944 `retrieve_values_info`, :1237
  * `retrieve_archive_info`): row counts come from the file footer, so
  * "how big is this value" never scans data pages — the difference
  * between a millisecond metadata call and a 100 TB table scan. */
object ParquetMeta {
  private val conf = new Configuration()

  /** Exact row count of one parquet file from its footer. */
  def rowCount(path: String): Long = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
    try r.getRecordCount finally r.close()
  }

  /** Every part-file under `dir`, recursively — a hive-partitioned
    * layout nests part-files inside `col=value` dirs, and a flat listing
    * would silently report such a table as 0 rows / 0 files. */
  private def partFiles[A](dir: String)(f: Iterator[java.nio.file.Path] => A): A = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return f(Iterator.empty)
    val s = java.nio.file.Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      f(s.iterator.asScala.filter(q =>
        java.nio.file.Files.isRegularFile(q) &&
          q.getFileName.toString.endsWith(".parquet")))
    } finally s.close()
  }

  /** Sum of footer row counts over every part-file in a parquet dir. */
  def dirRowCount(dir: String): Long =
    partFiles(dir)(_.map(f => rowCount(f.toString)).sum)

  /** Number of part-files in a parquet dir. */
  def dirFileCount(dir: String): Long = partFiles(dir)(_.size.toLong)

  /** Total on-disk bytes of a parquet dir's part-files. */
  def dirSizeBytes(dir: String): Long =
    partFiles(dir)(_.map(f => java.nio.file.Files.size(f)).sum)

  /** Footer min/max statistics of an INT64 column in one part-file —
    * the metadata a clustered layout exists for: a scan with a
    * predicate on `col` skips every file whose [min,max] misses it
    * without reading a data page. None if the column is absent or
    * carries no stats. */
  def colRange(path: String, col: String): Option[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
    try {
      val chunks = r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        .filter(c => c.getPath.toDotString == col)
        .flatMap(c => Option(c.getStatistics) match {
          case Some(s: org.apache.parquet.column.statistics.LongStatistics)
            if !s.isEmpty => Some((s.genericGetMin.toLong, s.genericGetMax.toLong))
          case _ => None
        })
      if (chunks.isEmpty) None
      else Some((chunks.map(_._1).min, chunks.map(_._2).max))
    } finally r.close()
  }

  /** Per-file [min,max] of an INT64 column over a parquet dir: one
    * entry per part-file that has stats for `col`. */
  def fileRanges(dir: String, col: String): Seq[(String, Long, Long)] =
    partFiles(dir)(_.flatMap { f =>
      colRange(f.toString, col).map { case (mn, mx) => (f.toString, mn, mx) }
    }.toSeq)
}
