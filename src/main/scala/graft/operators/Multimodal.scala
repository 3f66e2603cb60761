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

  /** Wrap a text table as fake media (utf-8 bytes as payload).
    * ORACLE CONTRACT: the q_llm_multimodal oracle recomputes the byte
    * stats character-wise (length()/ascii()), which matches byte-wise
    * decode only for ASCII text — true for the test corpus; a non-ASCII
    * corpus would need a byte-based oracle (DuckDB strlen/blob ops).
    */
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

  /** Decoded + geometry-normalized features (resize / frame-sample
    * stages). Kernels are deterministic stubs; the pipeline shape
    * (decode -> resize -> frame-sample, each a narrow batched stage) is
    * the real contract.
    */
  final case class MediaProcessed(
      media_id: Long, n_bytes: Long, head_sum: Long,
      fake_width: Int, fake_height: Int,
      resized_w: Int, resized_h: Int, n_frames: Int, format: String)

  /** "Resize" to fit a 224x224 box preserving the fake aspect ratio, and
    * "frame-sample" one frame per 4 KiB window — STUB geometry standing in
    * for a codec; the per-partition batch processing is real.
    */
  def process(ds: Dataset[MediaRecord], box: Int = 224,
      frameBytes: Int = 4096): Dataset[MediaProcessed] = {
    val spark = ds.sparkSession
    import spark.implicits._
    decode(ds).mapPartitions { it =>
      it.map { f =>
        val w = math.max(f.fake_width, 1)
        val h = math.max(f.fake_height, 1)
        // fit into box x box, preserving aspect (integer arithmetic only,
        // so both engines' mirrors agree exactly)
        val (rw, rh) =
          if (w >= h) (box, math.max(1, (h * box) / w))
          else (math.max(1, (w * box) / h), box)
        MediaProcessed(f.media_id, f.n_bytes, f.head_sum,
          f.fake_width, f.fake_height, rw, rh,
          ((f.n_bytes + frameBytes - 1) / frameBytes).toInt, f.format)
      }
    }
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
