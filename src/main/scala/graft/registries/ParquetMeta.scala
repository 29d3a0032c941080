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
}
