package graft

import org.apache.spark.sql.functions._
import graft.ops.Embeddings

class EmbeddingsSpec extends SparkSpec {

  private lazy val emb = graft.core.Tables.embeddings(spark, sfDir)

  test("block outer-product near-dup is identical to the brute-force oracle, any block count") {
    val bf = Embeddings.cosineNearDupBruteForce(emb, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (nBlocks <- Seq(1, 3, 16)) {
      val blocked = Embeddings.cosineNearDup(emb, 0.4, nBlocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(blocked == bf, s"nBlocks=$nBlocks diverged from brute force")
    }
  }

  test("auto-sized blocks (non-default target) match brute force") {
    val bf = Embeddings.cosineNearDupBruteForce(emb, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // tiny target forces many blocks: exercises the count-driven sizing
    // path end to end, not just explicit nBlocks values
    val auto = Embeddings.cosineNearDup(emb, 0.4, nBlocks = 0, targetRowsPerBlock = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto == bf, "auto-sized block count diverged from brute force")
  }

  test("block near-dup result is partitioning-independent") {
    val a = Embeddings.cosineNearDup(emb, 0.4)
      .collect().map(_.toString).sorted.toSeq
    val b = Embeddings.cosineNearDup(emb.repartition(7), 0.4)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("low-threshold block near-dup emits every pair exactly once") {
    val n = emb.count()
    val pairs = Embeddings.cosineNearDup(emb, -1.0).collect()
    assert(pairs.length.toLong == n * (n - 1) / 2)
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
    assert(keys.forall { case (d1, d2) => d1 < d2 })
  }
}
