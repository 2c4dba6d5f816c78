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
