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

  test("ivf at 200k vectors: exact top-5 agreement with brute force on a clustered corpus") {
    import spark.implicits._
    // deterministic 200k × 32-dim corpus: 32 well-separated cluster
    // directions (sign pattern from the cluster id) + small hash noise.
    // A vector's true neighbors are its cluster-mates, the IVF sample
    // (first 256 ids = 8 per cluster) lets farthest-first recover every
    // cluster direction, so nprobe=4 must contain the true top-5 — IVF
    // and brute force then select IDENTICAL sets (same scoring formula,
    // same tie-break). 100× the gate corpus: the scale check for the
    // ANN path, with ground truth by construction.
    val n = 200000L; val dim = 32; val nClusters = 32
    val emb = spark.range(n).map { id =>
      val c = (id % nClusters).toInt
      val arr = new Array[Float](dim)
      var j = 0
      while (j < dim) {
        val center = if (((c >> (j % 5)) & 1) == 1) 10f else -10f
        val h = graft.functions.BitMix.splitmix64(id * 64 + j)
        val noise = ((h >>> 11).toDouble / (1L << 53)).toFloat - 0.5f
        arr(j) = center + noise
        j += 1
      }
      (id, arr)
    }.toDF("vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val q = col("vec_id") < 8
      val ivf = Ann.ivfKnn(emb, q, k = 5, nlist = nClusters, nprobe = 4).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
      val bf = Embeddings.bruteForceKnn(emb, q, k = 5).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
      assert(ivf.keySet == bf.keySet && ivf.keySet.size == 8)
      for (qid <- bf.keySet)
        assert(ivf(qid) == bf(qid), s"query $qid: ivf=${ivf(qid)} bf=${bf(qid)}")
    } finally emb.unpersist()
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

  test("pqReport: exact reconstruction on a codebook-sized corpus; bigger codebooks reconstruct better") {
    import spark.implicits._
    // 16 vectors, 8 distinct constant patterns: FFT with ksub=8 recovers
    // every pattern as a centroid in every subspace → all d2 exactly 0,
    // each (subspace, code) cell holds exactly 2 vectors
    val planted = (0 until 16).map(i =>
      (i.toLong, Seq.fill(64)((i % 8).toFloat), 0)).toDF("vec_id", "embedding", "label")
    val pr = Ann.pqReport(planted).collect()
    assert(pr.length == 32, s"expected 4x8 populated cells, got ${pr.length}")
    pr.foreach { r =>
      assert(r.getLong(2) == 2L && r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0,
        s"imperfect reconstruction on a perfectly coverable corpus: $r")
    }

    // real corpus: report conserves counts (m rows of n each), codes stay
    // in range, and total weighted reconstruction error drops when the
    // codebook grows from ksub=2 to ksub=8
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    def tot(ksub: Int): Double = {
      val rows = Ann.pqReport(emb, m = 4, ksub = ksub).collect()
      val bySub = rows.groupBy(_.getLong(0))
      assert(bySub.size == 4 && bySub.values.forall(_.map(_.getLong(2)).sum == n),
        "cell counts do not conserve the corpus")
      rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < ksub, s"$r"))
      rows.map(r => r.getLong(2) * r.getDouble(3)).sum
    }
    val (coarse, fine) = (tot(2), tot(8))
    assert(fine < coarse,
      s"ksub=8 did not reconstruct better than ksub=2: $fine vs $coarse")
  }

  test("pqAdcRecall: exact reconstruction implies recall 1.0; real corpus stays in range") {
    import spark.implicits._
    // the q151 perfectly-coverable corpus: every vector reconstructs with
    // d2 = 0, so ADC distances EQUAL exact distances and every query's
    // ADC top-k is the exact top-k — recall exactly 1.0
    val planted = (0 until 16).map(i =>
      (i.toLong, Seq.fill(64)((i % 8).toFloat), 0)).toDF("vec_id", "embedding", "label")
    try {
      val pr = Ann.pqAdcRecall(planted, col("vec_id") < 4, k = 3).collect()
      assert(pr.length == 4, s"${pr.toSeq}")
      pr.foreach(r => assert(r.getDouble(3) == 1.0,
        s"perfect codes should yield perfect recall: $r"))

      // real corpus: every query reports k exact neighbors and a recall
      // in [0,1]; the coarse (m=4, ksub=8) codebook is NOT expected to be
      // servable here — the report exists to say so honestly
      val emb = graft.core.Tables.embeddings(spark, sfDir)
      val rows = Ann.pqAdcRecall(emb, col("vec_id") < 8, k = 5).collect()
      assert(rows.length == 8)
      rows.foreach { r =>
        assert(r.getLong(1) == 5L && r.getLong(2) >= 0L && r.getLong(2) <= 5L &&
          r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"$r")
      }
    } finally graft.core.InternalCaches.release(spark)
  }
}
