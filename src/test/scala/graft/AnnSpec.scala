package graft

import org.apache.spark.sql.functions._
import graft.ops.{Ann, Embeddings}

class AnnSpec extends SparkSpec {

  test("n-dim farthest-first: deterministic, covers space (radius shrinks with k)") {
    val rng = new scala.util.Random(13)
    val vecs = Array.fill(300)(Array.fill(16)(rng.nextGaussian()))
    def radius(cs: Array[Array[Double]]): Double = vecs.map { v =>
      cs.map { c =>
        math.sqrt(v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.min
    }.max
    val r4 = radius(Ann.farthestFirst(vecs, 4))
    val r32 = radius(Ann.farthestFirst(vecs, 32))
    assert(r32 < r4)
    assert(Ann.farthestFirst(vecs, 8).map(_.toSeq).toSeq ==
           Ann.farthestFirst(vecs, 8).map(_.toSeq).toSeq)
  }

  test("ivf index assigns every vector to a valid cell") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val (assigned, centroids) = Ann.ivfIndex(emb, nlist = 8)
    assert(centroids.length == 8)
    val cells = assigned.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf((0 until 8).toSet))
    assert(assigned.count() == emb.count())
  }

  test("ivf knn handles single-probe and single-cell configurations") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    // nprobe = 1: NearestCells' scalar fast path feeds the probe explode
    val one = Ann.ivfKnn(emb, org.apache.spark.sql.functions.col("vec_id") < 4,
      k = 3, nlist = 8, nprobe = 1)
    assert(one.count() > 0)
    // nprobe > nlist clamps instead of failing the expression require
    val clamped = Ann.ivfKnn(emb, org.apache.spark.sql.functions.col("vec_id") < 4,
      k = 3, nlist = 2, nprobe = 8)
    assert(clamped.count() > 0)
  }

  test("ivf knn: valid ranked output and reasonable recall vs brute force") {
    val ivf = Ann.qIvfKnn(spark, sfDir).collect()
    assert(ivf.nonEmpty)
    val byQ = ivf.groupBy(_.getLong(0))
    byQ.values.foreach { g =>
      val sims = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
    // nprobe=4 of nlist=16 cells: the true top-1 should be found for a
    // decent share of queries; require at least one hit (wiring check) on
    // this near-uniform corpus
    val bf = Embeddings.qKnn(spark, sfDir).collect()
      .filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = byQ.count { case (q, g) =>
      g.exists(r => bf.get(q).contains(r.getLong(2)))
    }
    assert(hits >= 1, s"IVF found none of the brute-force top-1s")
  }
}
