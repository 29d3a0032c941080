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

  /** Sum of footer row counts over every part-file in a parquet dir. */
  def dirRowCount(dir: String): Long = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return 0L
    val s = java.nio.file.Files.list(p)
    try s.iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(f => rowCount(f.toString)).sum
    finally s.close()
  }

  /** Number of part-files in a parquet dir. */
  def dirFileCount(dir: String): Long = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return 0L
    val s = java.nio.file.Files.list(p)
    try s.iterator.asScala.count(_.getFileName.toString.endsWith(".parquet")).toLong
    finally s.close()
  }

  /** Total on-disk bytes of a parquet dir's part-files. */
  def dirSizeBytes(dir: String): Long = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return 0L
    val s = java.nio.file.Files.list(p)
    try s.iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(f => java.nio.file.Files.size(f)).sum
    finally s.close()
  }
}
