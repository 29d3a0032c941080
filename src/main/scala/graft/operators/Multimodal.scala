package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride as opaque `binary`
  * columns with typed metadata structs alongside. The decode step is a
  * deterministic STUB (the real image/audio codecs are not in this
  * container) — but the Spark-side plumbing is real: schema, partition
  * preservation, per-partition batched processing via mapPartitions, and
  * a metadata struct contract a real decoder would fill the same way.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, format: String)

  /** Attach an opaque binary payload column (UTF-8 bytes of the text here;
    * in production this is the raw image/audio blob read from the lake). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Payload byte accounting — pure builtins, oracle-checkable. */
  def byteStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), octet_length(col("text")).cast("long").as("n_bytes"))
      .orderBy("doc_id")

  /** STUB decode: derives (width,height,format) deterministically from the
    * payload bytes. A real decoder swaps the body of `decodeOne` only; the
    * distributed shape (mapPartitions, one decode per row, no collect) is
    * exactly what a codec-backed version uses. */
  def decodeMeta(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeOne(id, bytes) })
  }

  private def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta = {
    // Deterministic fake: a real implementation decodes the codec header.
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.floorMod(h, 1024)
    val height = 64 + math.floorMod(h >> 10, 1024)
    val fmt = Array("png", "jpeg", "webp").apply(math.floorMod(h, 3))
    MediaMeta(id, bytes.length, width, height, fmt)
  }
}
