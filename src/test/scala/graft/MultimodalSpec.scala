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

  test("frame sampling: only videos, stride positions, deterministic hashes") {
    val frames = Multimodal.sampleFrames(media, stride = 10, maxFrames = 4).collect()
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet == videoIds)
    assert(frames.groupBy(_.media_id).values.forall(_.map(_.frame_idx).sorted.sameElements(Array(0, 10, 20, 30))))
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
