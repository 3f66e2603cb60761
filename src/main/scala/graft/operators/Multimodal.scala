package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2B-10): media payloads are
  * opaque BINARY columns + typed metadata structs; decode / feature
  * extraction runs batched per partition (the Scala analog of
  * mapInPandas batches).
  *
  * Two decode tiers:
  *  - IMAGES are REAL (r8): the JDK's own headless codec
  *    (javax.imageio) encodes, decodes, and resizes PNGs — see
  *    [[synthImages]]/[[decodeImages]], gated by q_llm_image_decode
  *    with an exact pixel-sum oracle.
  *  - AUDIO is REAL too (r8): javax.sound.sampled parses WAV/PCM —
  *    see [[synthAudio]]/[[decodeAudio]], gated by q_llm_audio_decode
  *    with an exact sample-statistics oracle.
  *  - VIDEO remains the one clearly-marked deterministic STUB
  *    ([[decode]]) — the JDK ships no video codec and none is
  *    resolvable offline; the Spark-side schema, partitioning, and
  *    batch shape are real and oracle-checked.
  *
  * Scale: every kernel is a narrow mapPartitions over the binary
  * column — no shuffle; executors stream batches; metadata-only
  * predicates (format, size) prune before decode.
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

  // ---------------------------------------------------------------
  // REAL image decode path (r8): the JDK ships a full headless image
  // codec (javax.imageio — PNG/BMP/JPEG encode+decode, Graphics2D
  // resize), so the decode stage needs no external library after all.
  // The corpus has no real images, so payloads are SYNTHESIZED as
  // actual PNGs whose geometry and pixels are deterministic integer
  // functions of doc_id — PNG is lossless, so decoding the bytes back
  // must reproduce the exact pixel sums a SQL oracle computes
  // arithmetically. That makes the codec round-trip itself (not a
  // stub) the thing the correctness gate checks.
  // ---------------------------------------------------------------

  /** A real PNG payload + its declared geometry. */
  final case class ImageRecord(media_id: Long, png: Array[Byte],
                               declared_w: Int, declared_h: Int)

  /** Features decoded from the PNG bytes (not from the declaration):
    * dimensions, exact per-channel pixel sums, and the real
    * area-averaged resize's output geometry (`resize_ok` = the resized
    * PNG re-decodes to exactly those dimensions). */
  final case class ImageFeatures(
      doc_id: Long, w: Int, h: Int,
      sum_r: Long, sum_g: Long, sum_b: Long,
      resized_w: Int, resized_h: Int, resize_ok: Boolean)

  /** Deterministic pixel function — mirrored by the oracle's integer
    * arithmetic. */
  private def rgbAt(id: Long, x: Int, y: Int): Int = {
    val r = ((id * 7 + x * 13 + y * 29) % 256).toInt
    val g = ((x * 3 + y * 5 + id) % 256).toInt
    val b = ((x + y * 2) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Synthesize one real PNG per doc_id: width 8 + id%24, height
    * 6 + id%16, pixels from [[rgbAt]]. Narrow mapPartitions — the
    * encode kernel runs where the data lives. */
  def synthImages(df: DataFrame): Dataset[ImageRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id")).as[Long].mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      it.map { id =>
        val w = (8 + id % 24).toInt
        val h = (6 + id % 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgbAt(id, x, y)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, "png", bos),
          "JDK PNG writer unavailable")
        ImageRecord(id, bos.toByteArray, w, h)
      }
    }
  }

  /** Decode the PNG BYTES (never trusting the declared geometry),
    * extract exact channel sums, and run a real Graphics2D
    * area-averaging resize into a `box`-bounded frame. Narrow batched
    * stage, no shuffle. */
  def decodeImages(ds: Dataset[ImageRecord], box: Int = 16)
      : Dataset[ImageFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.png))
        require(img != null, s"media ${r.media_id}: not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val (rw, rh) =
          if (w >= h) (box, math.max(1, (h * box) / w))
          else (math.max(1, (w * box) / h), box)
        val scaled = img.getScaledInstance(
          rw, rh, java.awt.Image.SCALE_AREA_AVERAGING)
        val out = new java.awt.image.BufferedImage(
          rw, rh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        out.getGraphics.drawImage(scaled, 0, 0, null)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        val back = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        ImageFeatures(r.media_id, w, h, sr, sg, sb, rw, rh,
          back != null && back.getWidth == rw && back.getHeight == rh)
      }
    }
  }

  // ---------------------------------------------------------------
  // REAL audio decode path (r8): javax.sound.sampled — also in the
  // JDK — writes and parses WAV/PCM. Same contract as images: real
  // WAV payloads synthesized from deterministic integer samples, the
  // decode stage parses the BYTES (header + PCM frames), and the
  // oracle recomputes the exact sample statistics arithmetically.
  // ---------------------------------------------------------------

  /** A real WAV payload (PCM16 mono) + its declared frame count. */
  final case class AudioRecord(media_id: Long, wav: Array[Byte],
                               declared_frames: Int)

  /** Features decoded from the WAV bytes: the format actually parsed
    * from the header, and exact integer sample statistics. */
  final case class AudioFeatures(
      doc_id: Long, sample_rate: Int, bits: Int, channels: Int,
      n_samples: Long, sum_s: Long, min_s: Int, max_s: Int, sum_sq: Long,
      duration_ms: Long)

  private val AudioRate = 8000

  /** Deterministic sample function — mirrored by the oracle. */
  private def sampleAt(id: Long, i: Int): Short =
    (((id * 31 + i * 17) % 4001) - 2000).toShort

  /** Synthesize one real WAV per doc_id: 64 + id%400 PCM16 samples at
    * 8 kHz mono from [[sampleAt]]. Narrow mapPartitions. */
  def synthAudio(df: DataFrame): Dataset[AudioRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (64 + id % 400).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = sampleAt(id, i)
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          AudioRate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        AudioRecord(id, bos.toByteArray, n)
      }
    }
  }

  /** Parse the WAV BYTES (header gives the format, frames give the
    * samples) and extract exact integer statistics. Narrow batched
    * stage, no shuffle; undecodable payloads fail loudly. */
  def decodeAudio(ds: Dataset[AudioRecord]): Dataset[AudioFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.wav))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              throw new IllegalArgumentException(
                s"media ${r.media_id}: not decodable audio", e)
          }
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"media ${r.media_id}: expected PCM16 mono, got $fmt")
        val data = ais.readAllBytes()
        val n = data.length / 2
        var (sum, sumSq) = (0L, 0L)
        var (mn, mx) = (Int.MaxValue, Int.MinValue)
        var i = 0
        while (i < n) {
          val s: Int =
            ((data(2 * i) & 0xff) | (data(2 * i + 1).toInt << 8)).toShort
          sum += s; sumSq += s.toLong * s
          if (s < mn) mn = s
          if (s > mx) mx = s
          i += 1
        }
        AudioFeatures(r.media_id, fmt.getSampleRate.toInt,
          fmt.getSampleSizeInBits, fmt.getChannels, n.toLong, sum, mn, mx,
          sumSq, n.toLong * 1000L / fmt.getSampleRate.toInt)
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
