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
  * Graphics2D filtering hints). AUDIO/VIDEO payloads keep clearly-marked
  * deterministic fakes (`fakeDecode*`): the JDK has no audio/video codecs,
  * and the Spark-side contract — schema, partitioning, batch iteration,
  * output shape — is identical either way, so swapping a JNI/FFI decoder in
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

  /** STUB decode kernel for AUDIO/VIDEO payloads (the JDK has no codecs
    * for them — a real build links one here; images use the real
    * [[decodeImageFeatures]] above). The fake is deterministic in the
    * payload bytes so tests are stable. */
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
    * Images run the REAL ImageIO decode; audio/video fall back to the
    * labeled stub kernel. Output is an embedding-like column ready for the
    * similarity operators in [[graft.ops.Embeddings]]. */
  def extractImageFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val feats =
          if (r.kind == "image") decodeImageFeatures(r.payload, dim)
          else fakeDecodeFeatures(r.payload, dim)
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

  /** Resize: real pixel resample for images; truncation stub for
    * audio/video (no JDK codec — see class doc). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(width = w, height = h,
      payload = if (r.kind == "image") resizeImage(r.payload, w, h)
                else fakeResize(r.payload, w, h)))
  }

  /** STUB pixel resample for audio/video — deterministic truncation. */
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

  /** Deterministic synthetic media table for tests/demos. Image rows carry
    * REAL PNG payloads (decoded by the real kernel); audio/video payloads
    * are seeded bytes for the labeled stubs. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      if (kind == "image") {
        val w = 16 + (i % 5).toInt; val h = 12 + (i % 3).toInt
        MediaRow(i, kind, syntheticPng(i, w, h), w, h, 0)
      } else {
        val rng = new scala.util.Random(i)
        val payload = new Array[Byte](256 + (i % 64).toInt)
        rng.nextBytes(payload)
        MediaRow(i, kind, payload, 640, 480, 16000)
      }
    }
  }

  /** Gate query: the full multimodal flow — synthetic media → batched
    * feature extraction → frame sampling — rolled up per kind. Rows-only
    * check (a real PNG codec round-trip is not ANSI SQL), but the output
    * is fully deterministic and partitioning-independent: the image path
    * is a lossless encode→decode→block-mean pipeline with order-fixed
    * integer arithmetic, feature norms are rounded then decimal-summed,
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
