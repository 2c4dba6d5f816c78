package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 30).cache()

  test("feature extraction: shape, determinism, partitioning-independence") {
    val f1 = Multimodal.extractImageFeatures(media, dim = 64).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractImageFeatures(media.repartition(7), dim = 64).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1.size == 30)
    assert(f1.values.forall(_.length == 64))
    assert(f1 == f2)  // kernel is per-row deterministic → layout-independent
  }

  test("image kernel is a REAL codec round-trip: PNG encode → ImageIO decode") {
    // the synthetic payload is a genuine PNG container (magic bytes), and
    // the decoded block-mean features reproduce a hand-computed value
    val png = Multimodal.syntheticPng(seed = 7L, w = 16, h = 12)
    assert(png.take(8).sameElements(
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 16 && img.getHeight == 12)
    val feats = Multimodal.decodeImageFeatures(png, dim = 64)
    // independent reference: block-mean luminance straight from the pixels
    val side = 8
    val sums = new Array[Long](64); val counts = new Array[Long](64)
    for (y <- 0 until 12; x <- 0 until 16) {
      val rgb = img.getRGB(x, y)
      val lum = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
        114L * (rgb & 0xff)
      val b = math.min(y * side / 12, side - 1) * side +
        math.min(x * side / 16, side - 1)
      sums(b) += lum; counts(b) += 1
    }
    val expected = (0 until 64).map(b =>
      (sums(b).toDouble / (counts(b) * 255000.0)).toFloat)
    assert(feats.toSeq == expected)
    // a corrupted payload fails loudly, never silently fakes
    intercept[IllegalArgumentException] {
      Multimodal.decodeImageFeatures(Array[Byte](1, 2, 3), dim = 64)
    }
  }

  test("image resize is a real pixel resample (decode → NN sample → PNG)") {
    val png = Multimodal.syntheticPng(seed = 3L, w = 16, h = 12)
    val resized = Multimodal.resizeImage(png, 8, 8)
    val out = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(out.getWidth == 8 && out.getHeight == 8)
    // nearest-neighbor contract: each output pixel equals its source pixel
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    for (y <- 0 until 8; x <- 0 until 8)
      assert((out.getRGB(x, y) & 0xffffff) ==
        (src.getRGB(math.min(x * 16 / 8, 15), math.min(y * 12 / 8, 11)) & 0xffffff))
  }

  test("audio kernel is a REAL codec round-trip: WAV encode → javax.sound decode") {
    // the synthetic payload is a genuine RIFF/WAVE container (magic bytes),
    // and the decoded block-RMS features reproduce a hand-computed value
    val wav = Multimodal.syntheticWav(seed = 7L, sampleRate = 16000, nSamples = 400)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate == 16000f)
    assert(ais.getFormat.getChannels == 1)
    val feats = Multimodal.decodeAudioFeatures(wav, dim = 8)
    assert(feats.length == 8)
    // independent reference: RMS straight from the generator's samples
    val samples = (0 until 400).map { i =>
      (graft.functions.BitMix.splitmix64(7L * 0x9e3779b97f4a7c15L + i) & 0xffff).toShort
    }
    val expected = (0 until 8).map { b =>
      val blk = samples.zipWithIndex
        .filter { case (_, i) => math.min(i * 8 / 400, 7) == b }.map(_._1)
      (math.sqrt(blk.map(s => s.toLong * s).sum.toDouble / blk.length) / 32768.0).toFloat
    }
    assert(feats.toSeq == expected)
    // a corrupted payload fails loudly, never silently fakes
    intercept[IllegalArgumentException] {
      Multimodal.decodeAudioFeatures(Array[Byte](1, 2, 3), dim = 8)
    }
  }

  test("audio resize is a real PCM resample (decode → NN sample → WAV)") {
    val wav = Multimodal.syntheticWav(seed = 3L, sampleRate = 16000, nSamples = 400)
    val resampled = Multimodal.resampleWav(wav, targetRate = 8000)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(resampled))
    assert(ais.getFormat.getSampleRate == 8000f)
    val bytes = ais.readAllBytes()
    assert(bytes.length / 2 == 200) // half the samples at half the rate
    // nearest-neighbor contract: output sample j equals source sample 2j
    val src = (0 until 400).map { i =>
      (graft.functions.BitMix.splitmix64(3L * 0x9e3779b97f4a7c15L + i) & 0xffff).toShort
    }
    for (j <- 0 until 200) {
      val s = (((bytes(2 * j + 1).toInt) << 8) | (bytes(2 * j) & 0xff)).toShort
      assert(s == src(j * 2))
    }
    // WAV bytes (unlike PNG bytes) are deterministic: fixed-layout
    // uncompressed container, so a byte-level round-trip is stable
    assert(Multimodal.resampleWav(wav, 8000).sameElements(resampled))
    // a valid-but-EMPTY container fails loudly (documented precondition),
    // not with an opaque negative array index
    val e = intercept[IllegalArgumentException] {
      Multimodal.resampleWav(
        Multimodal.syntheticWav(seed = 1L, sampleRate = 16000, nSamples = 0), 8000)
    }
    assert(e.getMessage.contains("empty PCM stream"))
  }

  test("video kernel is a REAL codec round-trip: GIF encode → ImageIO frames") {
    // the synthetic payload is a genuine GIF container (magic bytes), the
    // JDK reader recovers the full frame count, and — grayscale palette,
    // so the round trip is lossless — every decoded pixel equals the
    // generator's value
    val gif = Multimodal.syntheticGif(seed = 9L, w = 16, h = 12, nFrames = 5)
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8"))
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif))
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 5)
    for (k <- 0 until 5; y <- 0 until 12; x <- 0 until 16) {
      val expected = (graft.functions.BitMix.splitmix64(
        9L * 0x9e3779b97f4a7c15L + k.toLong * 16 * 12 + y.toLong * 16 + x) & 0xff).toInt
      assert((reader.read(k).getRGB(x, y) & 0xff) == expected,
        s"frame $k pixel ($x,$y)")
    }
    reader.dispose(); iis.close()
    // video features: spatiotemporal block means over the decoded frames
    val feats = Multimodal.decodeVideoFeatures(gif, dim = 64)
    assert(feats.length == 64 && feats.forall(f => f >= 0f && f <= 1f))
    // a corrupted payload fails loudly, never silently fakes
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideoFeatures(Array[Byte](1, 2, 3), dim = 64)
    }
  }

  test("video resize is a real per-frame resample (decode → NN sample → GIF)") {
    val gif = Multimodal.syntheticGif(seed = 4L, w = 16, h = 12, nFrames = 3)
    val resized = Multimodal.resizeGif(gif, 8, 8)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(resized))
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 3)
    for (k <- 0 until 3; y <- 0 until 8; x <- 0 until 8) {
      val expected = (graft.functions.BitMix.splitmix64(
        4L * 0x9e3779b97f4a7c15L + k.toLong * 16 * 12 +
          math.min(y * 12 / 8, 11).toLong * 16 + math.min(x * 16 / 8, 15)) & 0xff).toInt
      assert((reader.read(k).getRGB(x, y) & 0xff) == expected)
    }
    reader.dispose(); iis.close()
  }

  test("frame sampling: only videos, stride positions from REAL frames, deterministic hashes") {
    val frames = Multimodal.sampleFrames(media, stride = 10, maxFrames = 4).collect()
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet == videoIds)
    // every synthetic video holds >= 31 frames, so all 4 stride positions exist
    assert(frames.groupBy(_.media_id).values.forall(_.map(_.frame_idx).sorted.sameElements(Array(0, 10, 20, 30))))
    // hashes are pixel-content hashes: stable across runs, distinct across frames
    val f2 = Multimodal.sampleFrames(media, stride = 10, maxFrames = 4).collect()
    assert(frames.map(f => (f.media_id, f.frame_idx) -> f.frame_hash).toMap ==
           f2.map(f => (f.media_id, f.frame_idx) -> f.frame_hash).toMap)
    assert(frames.groupBy(_.media_id).values.forall(g => g.map(_.frame_hash).distinct.length == g.length))
    // a video shorter than the stride span emits only its real frames
    import media.sparkSession.implicits._
    val shortVid = Seq(Multimodal.MediaRow(99L, "video",
      Multimodal.syntheticGif(99L, 8, 8, nFrames = 15), 8, 8, 0)).toDS()
    val got = Multimodal.sampleFrames(shortVid, stride = 10, maxFrames = 4).collect()
    assert(got.map(_.frame_idx).sorted.sameElements(Array(0, 10)))
  }

  test("q70a decoded shapes equal the synthesis closed forms, per kind") {
    // the gate's hash-match argument at test scale: every integer Spark
    // reports must come out of a real decode AND equal the formula the
    // oracle recomputes — i%3 kind, (16+i%5)(12+i%3) px, 400+(i%64)*4
    // samples, 31+i%5 frames (sampler keeps 4: every clip has >= 31)
    val got = Multimodal.decodedShapesSummary(Multimodal.syntheticMedia(spark, 300))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def expect(kind: Int): (Long, Long, Long) = {
      val is = (0 until 300).filter(_ % 3 == kind)
      val units = is.map { i =>
        kind match {
          case 0 => (16L + i % 5) * (12L + i % 3)
          case 1 => 400L + (i % 64) * 4
          case _ => 31L + i % 5
        }
      }.sum
      (is.size.toLong, units, if (kind == 2) 4L * is.size else 0L)
    }
    assert(got == Map("image" -> expect(0), "audio" -> expect(1), "video" -> expect(2)))
  }

  test("resize keeps ids and updates metadata") {
    val resized = Multimodal.resize(media, 64, 64).collect()
    assert(resized.length == 30)
    assert(resized.forall(r => r.width == 64 && r.height == 64))
  }

  test("extracted features flow into the similarity operators end-to-end") {
    import org.apache.spark.sql.functions._
    val features = Multimodal.extractImageFeatures(media, dim = 64)
      .toDF().select(col("media_id").as("vec_id"), col("features").as("embedding"))
    // media → features → pairwise cosine: the multimodal-to-similarity
    // pipeline contract (same column shapes as the embeddings table)
    val pairs = graft.ops.Embeddings.cosineNearDup(features, threshold = -1.0)
    assert(pairs.count() == 30L * 29 / 2)
    val knn = graft.ops.Embeddings.bruteForceKnn(features, col("vec_id") < 3, k = 4)
    assert(knn.count() == 12)
  }
}
