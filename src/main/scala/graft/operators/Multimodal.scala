package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2B-10): media payloads are
  * opaque BINARY columns + typed metadata structs; decode / feature
  * extraction runs batched per partition (the Scala analog of
  * mapInPandas batches — the decode kernel itself is a clearly-marked
  * deterministic STUB because no image/audio codecs exist in this
  * container, but the Spark-side schema, partitioning, and batch shape
  * are real and oracle-checked).
  *
  * Scale: decode is a narrow mapPartitions over the binary column — no
  * shuffle; executors stream batches; metadata-only predicates (format,
  * size) prune before decode.
  */
object Multimodal {

  /** A media record: binary payload + metadata (reference shape: image). */
  final case class MediaRecord(
      media_id: Long, content: Array[Byte], format: String, declared_len: Long)

  /** Extracted features. STUB decode: byte stats stand in for real pixel
    * decode (`???` would be the codec call); everything downstream of the
    * stub is real Spark plumbing.
    */
  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, head_sum: Long,
      fake_width: Int, fake_height: Int, format: String)

  /** Wrap a text table as fake media (utf-8 bytes as payload). */
  def asMedia(df: DataFrame): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      lit("text/plain").as("format"),
      length(col("text")).cast("long").as("declared_len"))
      .as[MediaRecord]
  }

  /** Batched per-partition "decode" (stub kernel, real batch shape). */
  def decode(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        // STUB: a real implementation would decode r.content with a codec
        // here; we extract deterministic byte statistics instead.
        val n = r.content.length.toLong
        val headSum = r.content.take(16).map(b => (b & 0xff).toLong).sum
        MediaFeatures(
          media_id = r.media_id,
          n_bytes = n,
          head_sum = headSum,
          fake_width = (n % 640).toInt,
          fake_height = ((n / 640) + 1).toInt,
          format = r.format)
      }
    }
  }
}
