package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, processed
  * per-partition in batches (the Scala analogue of `mapInPandas` — one
  * iterator pass per partition, no per-row serialization overhead).
  *
  * The IMAGE path is fully real: payloads are genuine PNG bytes (encoded by
  * `javax.imageio`, which ships in the JDK — no container codec needed),
  * decoded back to pixels inside the executors, with features computed from
  * block-mean luminance and resize done by an explicit nearest-neighbor
  * resample (arithmetic we control — deterministic on any JVM, unlike
  * Graphics2D filtering hints). The AUDIO path is equally real: payloads are
  * genuine RIFF/WAVE containers (16-bit PCM, written and parsed by
  * `javax.sound.sampled`, also JDK-shipped), features are per-block RMS
  * energy over the decoded samples, and resize maps to a nearest-neighbor
  * PCM resample. Only VIDEO keeps a clearly-marked deterministic fake
  * (`fakeDecode*`/`fakeFrameHash`): the JDK has no video codec, and the
  * Spark-side contract — schema, partitioning, batch iteration, output
  * shape — is identical either way, so swapping a JNI/FFI decoder in
  * changes no plumbing.
  */
object Multimodal {

  /** ImageIO defaults to a disk-backed stream cache; tiny in-memory
    * payloads want the memory cache. JVM-wide, idempotent, safe from
    * multiple executor threads. */
  private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Typed media row: payload + metadata travelling together. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int, sample_rate: Int)

  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 features: Array[Float])

  final case class FrameSample(media_id: Long, frame_idx: Int, frame_hash: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false)))

  /** REAL image decode kernel: PNG/BMP/JPEG via the JDK's `javax.imageio`.
    * Features are the √dim×√dim grid of block-mean luminance (integer
    * Rec.601 weights summed per block, one divide per block — order-fixed
    * arithmetic, so the output is bit-deterministic across JVMs and
    * partitionings). PNG decode itself is exact (lossless format), so the
    * whole kernel is a pure function of the payload bytes. */
  private[graft] def decodeImageFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    imageIoInit
    val side = math.sqrt(dim.toDouble).toInt
    require(side * side == dim,
      s"graft multimodal: feature dim must be a perfect square, got $dim")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "graft multimodal: payload is not a decodable image")
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var y = 0
    while (y < h) {
      val by = math.min(y * side / h, side - 1)
      var x = 0
      while (x < w) {
        val bx = math.min(x * side / w, side - 1)
        val rgb = img.getRGB(x, y)
        val lum = 299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff) // Rec.601 ×1000, exact in Long
        val b = by * side + bx
        sums(b) += lum; counts(b) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](dim)
    var b = 0
    while (b < dim) {
      // mean luminance scaled to [0,1]; empty blocks (image smaller than
      // the grid) read as 0 rather than NaN
      out(b) = if (counts(b) == 0) 0.0f
               else (sums(b).toDouble / (counts(b) * 255000.0)).toFloat
      b += 1
    }
    out
  }

  /** REAL audio decode kernel: RIFF/WAVE (16-bit PCM) via the JDK's
    * `javax.sound.sampled`. Features are `dim` blocks of RMS energy over the
    * decoded sample stream, scaled to [0,1] (sum of squares kept exact in
    * Long, one divide + sqrt per block — order-fixed arithmetic, so output
    * is bit-deterministic across JVMs and partitionings; PCM decode itself
    * is exact byte→short reassembly). */
  private[graft] def decodeAudioFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val samples = decodeWavSamples(payload)._1
    val n = samples.length
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < n) {
      val b = math.min((i.toLong * dim / n).toInt, dim - 1)
      val s = samples(i).toLong
      sums(b) += s * s; counts(b) += 1
      i += 1
    }
    val out = new Array[Float](dim)
    var b = 0
    while (b < dim) {
      // RMS scaled by the 16-bit full scale; empty blocks (clip shorter
      // than the grid) read as 0 rather than NaN
      out(b) = if (counts(b) == 0) 0.0f
               else (math.sqrt(sums(b).toDouble / counts(b)) / 32768.0).toFloat
      b += 1
    }
    out
  }

  /** Decode a WAV payload to (samples, sampleRate). Mono 16-bit PCM only —
    * the contract [[syntheticWav]] writes; anything else fails loudly
    * (never silently fakes). */
  private def decodeWavSamples(payload: Array[Byte]): (Array[Short], Int) = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch { case e: javax.sound.sampled.UnsupportedAudioFileException =>
        throw new IllegalArgumentException(
          "graft multimodal: payload is not a decodable audio container", e) }
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"graft multimodal: expected mono 16-bit PCM, got $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    val samples = new Array[Short](n)
    var i = 0
    if (fmt.isBigEndian)
      while (i < n) {
        samples(i) = (((bytes(2 * i).toInt) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
        i += 1
      }
    else
      while (i < n) {
        samples(i) = (((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)).toShort
        i += 1
      }
    (samples, fmt.getSampleRate.toInt)
  }

  /** REAL audio resample: decode PCM, nearest-neighbor sample pick to the
    * target rate (same integer index rule as the image resample), re-encode
    * as WAV. WAV is an uncompressed fixed-layout container, so — unlike the
    * PNG writer — the re-encoded BYTES are deterministic across JDKs, not
    * just the samples. */
  private[graft] def resampleWav(payload: Array[Byte], targetRate: Int): Array[Byte] = {
    val (samples, srcRate) = decodeWavSamples(payload)
    val n = samples.length
    val outN = math.max(1, (n.toLong * targetRate / srcRate).toInt)
    val out = new Array[Short](outN)
    var j = 0
    while (j < outN) {
      out(j) = samples(math.min((j.toLong * n / outN).toInt, n - 1))
      j += 1
    }
    encodeWav(out, targetRate)
  }

  /** Encode mono 16-bit little-endian PCM as a RIFF/WAVE container via the
    * JDK writer. */
  private def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** STUB decode kernel for VIDEO payloads (the JDK has no video codec — a
    * real build links one here; images and audio use the real kernels
    * above). The fake is deterministic in the payload bytes so tests are
    * stable. */
  private[multimodal] def fakeDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    i = 0
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = ((h >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** STUB frame hash: a real build decodes the container and hashes pixels. */
  private[multimodal] def fakeFrameHash(payload: Array[Byte], frameIdx: Int): Long = {
    var h = 0xcbf29ce484222325L ^ frameIdx.toLong
    var i = frameIdx % math.max(payload.length, 1)
    var n = 0
    while (n < 64 && payload.length > 0) {
      h = (h ^ (payload(i) & 0xff)) * 0x100000001b3L
      i = (i + 7) % payload.length
      n += 1
    }
    h
  }

  /** Feature extraction: batched per-partition pass over binary payloads.
    * Images run the REAL ImageIO decode, audio the REAL WAV decode; only
    * video falls back to the labeled stub kernel. Output is an
    * embedding-like column ready for the similarity operators in
    * [[graft.ops.Embeddings]]. */
  def extractImageFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val feats = r.kind match {
          case "image" => decodeImageFeatures(r.payload, dim)
          case "audio" => decodeAudioFeatures(r.payload, dim)
          case _       => fakeDecodeFeatures(r.payload, dim)
        }
        ImageFeatures(r.media_id, r.width, r.height, feats)
      }
    }
  }

  /** Frame sampling: every `stride`-th frame up to `maxFrames` per video. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 10, maxFrames: Int = 8): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0 until maxFrames).iterator.map(k => FrameSample(r.media_id, k * stride, fakeFrameHash(r.payload, k * stride)))
    }
  }

  /** REAL image resize: decode via ImageIO, explicit nearest-neighbor
    * resample (integer index arithmetic — deterministic, no Graphics2D
    * filtering-hint variance), re-encode as PNG.
    *
    * Determinism boundary: the resampled PIXELS are deterministic across
    * JVMs, but the re-encoded PNG BYTES are whatever the running JDK's PNG
    * writer emits (compression choices are not pinned across JDK versions).
    * Hash decoded pixels in any cross-JVM check — never the resized
    * payload bytes. */
  private[graft] def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    imageIoInit
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "graft multimodal: payload is not a decodable image")
    val sw = img.getWidth; val sh = img.getHeight
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = math.min(y * sh / h, sh - 1)
      var x = 0
      while (x < w) {
        val sx = math.min(x * sw / w, sw - 1)
        out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Resize: real pixel resample for images; real PCM resample for audio
    * (rate halves, nearest-neighbor sample pick — the audio analogue of
    * shrinking an image); truncation stub for video (no JDK codec — see
    * class doc). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      r.kind match {
        case "image" => r.copy(width = w, height = h,
          payload = resizeImage(r.payload, w, h))
        case "audio" =>
          val rate = math.max(1, r.sample_rate / 2)
          r.copy(width = w, height = h, sample_rate = rate,
            payload = resampleWav(r.payload, rate))
        case _ => r.copy(width = w, height = h,
          payload = fakeResize(r.payload, w, h))
      }
    }
  }

  /** STUB pixel resample for video — deterministic truncation. */
  private[multimodal] def fakeResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(payload.length, w * h / 64))
    java.util.Arrays.copyOf(payload, target)
  }

  /** Deterministic synthetic PNG: seeded pseudo-random RGB pixels encoded
    * by the JDK's PNG writer — a genuine compressed image container, so the
    * decode path in [[decodeImageFeatures]]/[[resizeImage]] exercises a
    * real codec round trip. */
  private[graft] def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    imageIoInit
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val hsh = graft.functions.BitMix.splitmix64(
          seed * 0x9e3779b97f4a7c15L + y.toLong * w + x)
        img.setRGB(x, y, (hsh & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic WAV: seeded pseudo-random 16-bit PCM samples
    * in a genuine RIFF/WAVE container, so the decode path in
    * [[decodeAudioFeatures]]/[[resampleWav]] exercises a real codec round
    * trip. */
  private[graft] def syntheticWav(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val samples = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      val h = graft.functions.BitMix.splitmix64(
        seed * 0x9e3779b97f4a7c15L + i)
      samples(i) = (h & 0xffff).toShort
      i += 1
    }
    encodeWav(samples, sampleRate)
  }

  /** Deterministic synthetic media table for tests/demos. Image rows carry
    * REAL PNG payloads, audio rows REAL WAV payloads (both decoded by the
    * real kernels); video payloads are seeded bytes for the labeled stub. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      Seq("image", "audio", "video")(i.toInt % 3) match {
        case "image" =>
          val w = 16 + (i % 5).toInt; val h = 12 + (i % 3).toInt
          MediaRow(i, "image", syntheticPng(i, w, h), w, h, 0)
        case "audio" =>
          MediaRow(i, "audio", syntheticWav(i, 16000, 400 + (i % 64).toInt * 4),
            0, 0, 16000)
        case _ =>
          val rng = new scala.util.Random(i)
          val payload = new Array[Byte](256 + (i % 64).toInt)
          rng.nextBytes(payload)
          MediaRow(i, "video", payload, 640, 480, 0)
      }
    }
  }

  /** Gate query: the full multimodal flow — synthetic media → batched
    * feature extraction → frame sampling — rolled up per kind. Rows-only
    * check (real PNG/WAV codec round-trips are not ANSI SQL), but the
    * output is fully deterministic and partitioning-independent: the image
    * path is a lossless encode→decode→block-mean pipeline and the audio
    * path a PCM encode→decode→block-RMS pipeline, both with order-fixed
    * integer arithmetic; feature norms are rounded then decimal-summed,
    * frame hashes are xor-folded, so the driver's byte-determinism check
    * holds.
    * The `sfDir` argument is unused (media is synthesized — the parquet
    * fixtures carry no binary payload column); scale comes from the same
    * per-partition batch kernels a real corpus would run. */
  def qMultimodalSummary(s: SparkSession, dir: String): DataFrame = {
    val media = syntheticMedia(s, 300)
    val feats = extractImageFeatures(media, dim = 64).toDF()
      .select(col("media_id"), col("features"))
    graft.functions.GraftFunctions.register(s)
    val kinds = media.toDF().select(col("media_id"), col("kind"))
    val norms = feats
      .withColumn("nrm", round(sqrt(expr("graft_dot(features, features)")), 6))
    val frames = sampleFrames(media, stride = 10, maxFrames = 4).toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
           expr("bit_xor(frame_hash)").as("frame_sig"))
    kinds.join(norms, "media_id")
      .join(frames, Seq("media_id"), "left")
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("nrm").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_norm"),
        sum(coalesce(col("n_frames"), lit(0L))).cast(LongType).as("n_frames"),
        expr("bit_xor(coalesce(frame_sig, CAST(0 AS BIGINT)))").as("kind_sig"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_multimodal_summary" -> (qMultimodalSummary _),
  )
}
