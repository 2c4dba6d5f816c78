package graft

import org.apache.spark.sql.functions._
import graft.ops.Clustering

class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  /** Three well-separated planted clusters; vec_ids 0/1/2 land one per
    * cluster so the lowest-id seeding starts one seed in each basin. */
  private def plantedClusters(perCluster: Int): org.apache.spark.sql.DataFrame = {
    val rng = new scala.util.Random(7L)
    val centers = Array(Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    val rows = for (i <- 0 until perCluster; c <- 0 until 3) yield {
      val v = centers(c).map(x => x + rng.nextFloat() * 0.5f)
      ((i * 3 + c).toLong, v.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "planted")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("lloyd recovers planted clusters and converges before maxIters") {
    val emb = plantedClusters(40)
    val (cents, assigned) = Clustering.kmeans(emb, k = 3, maxIters = 10)
    assert(cents.length == 3)
    // every planted cluster maps to exactly one centroid index, and the
    // mapping is a bijection (no two planted clusters merged)
    val m = assigned.groupBy(col("planted"))
      .agg(countDistinct(col("cidx")).as("nc"), first(col("cidx")).as("cidx"))
      .collect()
    assert(m.forall(_.getLong(1) == 1L), "a planted cluster split across centroids")
    assert(m.map(_.getInt(2)).distinct.length == 3, "two planted clusters merged")
    // converged: one more update moves nothing
    val next = Clustering.updateCentroids(Clustering.assign(emb, cents), cents)
    assert(next.zip(cents).forall { case (a, b) => java.util.Arrays.equals(a, b) })
  }

  test("assignment and the q85 gate are partitioning-independent") {
    val a = graft.ops.Clustering.qKmeansAssign(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val emb7 = graft.core.Tables.embeddings(spark, sfDir).repartition(7)
    val seed = emb7.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").cast("long"), col("embedding")).collect()
    val cents = seed.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val cids = array(seed.map(r => lit(r.getLong(0))): _*)
    val b = Clustering.assign(emb7, cents)
      .withColumn("cid", element_at(cids, col("cidx") + 1))
      .groupBy(col("cid"))
      .agg(count(lit(1)).cast("long").as("n"), sum(col("vec_id")).cast("long").as("sum_vid"))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("a cluster that loses every member keeps its previous centroid") {
    // both centroids sit at the SAME point, so the tie rule (lowest index)
    // sends every vector to index 0 and cluster 1 receives nothing: one
    // update must move centroid 0 to the data mean and leave centroid 1
    // exactly where it was
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(3f, 0f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val seeds = Array(Array(2.0, 0.0), Array(2.0, 0.0))
    val assigned = Clustering.assign(emb, seeds)
    assert(assigned.filter(col("cidx") === 1).count() == 0)
    val next = Clustering.updateCentroids(assigned, seeds)
    assert(next(0).sameElements(Array(2.0, 0.0)))
    assert(next(1).sameElements(Array(2.0, 0.0)), "empty cluster drifted from its seed")
  }

  test("semantic dedup finds only true near-dup pairs, at a measured recall") {
    try {
      // cluster-bucketed pairs must be a SUBSET of the exact q41 graph
      // (precision 1.0 by construction — scoring is identical, only the
      // candidate space shrinks); recall loss is pairs split across
      // cluster boundaries
      val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val exact = graft.ops.Embeddings.cosineNearDup(emb, 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sem = graft.ops.Clustering.semanticNearDup(emb, k = 8, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(sem.subsetOf(exact), s"semantic dedup invented pairs: ${sem -- exact}")
      assert(sem.nonEmpty, "semantic dedup found nothing at sf0.01")
      val recall = sem.size.toDouble / exact.size
      assert(recall >= 0.25, s"recall collapsed: ${sem.size}/${exact.size}")
    } finally graft.core.InternalCaches.release(spark)
  }

  test("cluster sampling equals the naive window rank and plans the bounded heap") {
    import org.apache.spark.sql.expressions.Window
    try {
      val emb = graft.core.Tables.embeddings(spark, sfDir)
      val got = graft.ops.Clustering.clusterSample(emb, k = 8, perCluster = 5)
      val p = got.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKey"), s"q89 lost the bounded-heap operator:\n$p")
      assert(!p.contains("Window"), s"q89 fell back to a window:\n$p")
      // naive twin: same assignment, same ordering, window rank
      val seed = emb.orderBy(col("vec_id")).limit(8)
        .select(col("vec_id").cast("long"), col("embedding")).collect()
      val cents = seed.map(_.getSeq[Float](1).map(_.toDouble).toArray)
      val cids = array(seed.toIndexedSeq.map(r => lit(r.getLong(0))): _*)
      val naive = graft.ops.Clustering.assign(emb, cents)
        .withColumn("cid", element_at(cids, col("cidx") + 1))
        .withColumn("nrm", sqrt(expr("graft_dot(embedding, embedding)")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("cid")).orderBy(col("nrm").desc, col("vec_id").asc)))
        .filter(col("rk") <= 5)
        .select(col("cid"), col("vec_id"), round(col("nrm"), 6).as("nrm"))
      assert(got.collect().map(_.toString).sorted.toSeq ==
        naive.collect().map(_.toString).sorted.toSeq)
    } finally graft.core.InternalCaches.release(spark)
  }

  test("synthetic vectors: deterministic, cluster membership = assignment ground truth") {
    try {
      // determinism across partitionings — every row a pure function of id
      val a = graft.sources.SyntheticVectors.clustered(spark, 640L)
      val b = graft.sources.SyntheticVectors.clustered(spark, 640L).repartition(7)
      assert(a.collect().map(_.toString).sorted.toSeq ==
        b.collect().map(_.toString).sorted.toSeq)
      // the 1M bench anchor's golden at test scale: seeds are one per
      // center (ids cycle), so seeded assignment recovers id % 64 exactly
      val wrong = graft.ops.Clustering.assignSeeded(a, 64)
        .filter(col("cidx") =!= pmod(col("vec_id"), lit(64)).cast("int")).count()
      assert(wrong == 0L, s"$wrong vectors assigned off their planted center")
      // and IVF top-k agrees with brute force on this well-separated corpus
      val exact = graft.ops.Embeddings.bruteForceKnn(a, col("vec_id") < 4, 5)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = graft.ops.Ann.ivfKnn(a, col("vec_id") < 4, k = 5)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (approx & exact).size.toDouble / exact.size
      assert(recall >= 0.9, s"IVF recall $recall vs brute force")
    } finally graft.core.InternalCaches.release(spark)
  }

  test("kmeans persists an uncached input internally (loud cache contract)") {
    try {
      val emb = plantedClusters(20) // NOT persisted by the caller
      assert(emb.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      val before = graft.core.InternalCaches.registeredCount(spark)
      val (cents, assigned) = Clustering.kmeans(emb, k = 3, maxIters = 5)
      assert(graft.core.InternalCaches.registeredCount(spark) > before,
        "kmeans left an uncached input to be re-scanned every iteration")
      assert(cents.length == 3 && assigned.count() == 60)
      // a caller-persisted input is respected, not double-persisted
      val cached = plantedClusters(20).persist()
      try {
        cached.count()
        val n0 = graft.core.InternalCaches.registeredCount(spark)
        Clustering.kmeans(cached, k = 3, maxIters = 5)
        assert(graft.core.InternalCaches.registeredCount(spark) == n0,
          "kmeans re-persisted a frame the caller already cached")
      } finally cached.unpersist()
    } finally graft.core.InternalCaches.release(spark)
  }

  /** Skew twin of the semantic-dedup recall test (the vector analogue of
    * round 9's `reference_text_skew` LSH tier): one cluster owns ~30% of
    * the corpus. Vectors are deterministic center+jitter with jitter large
    * enough that BASE pairs stay under the 0.999 threshold, plus planted
    * twin pairs (tiny perturbation → sim ≥ threshold). Asserts (a) recall
    * 1.0 on the planted pairs, (b) precision vs the exact all-pairs graph,
    * and (c) the candidate space stayed Σ|cluster|·(|cluster|−1)/2 — the
    * operator's documented bound — with the hot cluster's share measured,
    * so a skewed assignment cannot silently explode the join. */
  test("semantic dedup holds recall and the candidate bound on a skewed corpus") {
    try {
      val dim = 8
      val nBase = 4000
      val nPlant = 60
      // cluster of vector i: 30% to cluster 0, rest uniform over 1..7
      def clusterOf(i: Long): Int = {
        val h = graft.functions.BitMix.splitmix64(i * 31L + 7L)
        if (java.lang.Long.remainderUnsigned(h, 10L) < 3L) 0
        else 1 + java.lang.Long.remainderUnsigned(
          graft.functions.BitMix.splitmix64(h), 7L).toInt
      }
      def baseVec(i: Long): Array[Float] = {
        val c = clusterOf(i)
        Array.tabulate(dim) { j =>
          val center = if (j == c) 10.0 else 0.0
          val jit = (java.lang.Long.remainderUnsigned(
            graft.functions.BitMix.splitmix64(i * dim + j + 0x9e37L), 1000L)
            / 1000.0 - 0.5) * 2.0 // ±1 per component
          (center + jit).toFloat
        }
      }
      // ids 0..7: one clean seed per cluster so lowest-id seeding lands
      // one seed in each basin
      def seedVec(c: Int): Array[Float] =
        Array.tabulate(dim)(j => if (j == c) 10.0f else 0.0f)
      val rows =
        (0 until 8).map(c => (c.toLong, seedVec(c).toSeq)) ++
        (8 until nBase).map(i => (i.toLong, baseVec(i).toSeq)) ++
        // planted twins: vector nBase+p duplicates vector 8+p with a tiny
        // nudge on one component — cosine ≈ 1 > 0.999
        (0 until nPlant).map { p =>
          val src = baseVec(8L + p)
          src(0) = src(0) + 0.001f
          ((nBase + p).toLong, src.toSeq)
        }
      val emb = rows.toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
      val threshold = 0.999
      val got = graft.ops.Clustering.semanticNearDup(emb, k = 8, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = graft.ops.Embeddings.cosineNearDup(emb, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val planted = (0 until nPlant).map(p => (8L + p, (nBase + p).toLong)).toSet
      // every planted twin lands in its source's cluster (the nudge is
      // tiny), so cluster-bucketing loses NONE of them: recall 1.0
      assert(planted.subsetOf(got),
        s"skewed corpus lost planted pairs: ${planted -- got}")
      assert(got.subsetOf(exact), s"invented pairs: ${got -- exact}")
      // candidate-space bound: Σ nc·(nc−1)/2 with the hot cluster at ~30%
      val sizes = graft.ops.Clustering.assignSeeded(emb, 8)
        .groupBy(col("cidx")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val n = nBase + nPlant
      val hotShare = sizes.getOrElse(0, 0L).toDouble / n
      assert(hotShare > 0.25 && hotShare < 0.35,
        s"skew not planted as designed: hot share $hotShare")
      val candPairs = sizes.values.map(c => c * (c - 1) / 2).sum
      val allPairs = n.toLong * (n - 1) / 2
      // the documented bound: bucketing must beat all-pairs by at least
      // the Σ|c|² factor this skew implies (~0.30²+7·0.10² ≈ 0.16)
      assert(candPairs < allPairs / 5,
        s"candidate space did not shrink: $candPairs vs all-pairs $allPairs")
    } finally graft.core.InternalCaches.release(spark)
  }

  test("updateCentroids computes exact per-component means") {
    val emb = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(2f, 4f)), // cluster 0 mean (1, 2)
      (2L, Seq(10f, 10f))                   // cluster 1 stays put
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val seeds = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val next = Clustering.updateCentroids(Clustering.assign(emb, seeds), seeds)
    assert(next(0).sameElements(Array(1.0, 2.0)))
    assert(next(1).sameElements(Array(10.0, 10.0)))
  }

  test("silhouette: planted two-cluster geometry hits the closed-form means") {
    // seeds = two lowest vec_ids: c0 = (0,0), c1 = (10,0). Members: vec 2
    // sits ON c0 (a=0, b=10 → s=1), vec 3 ON c1 (s=1), vec 4 at (5,0) is
    // EQUIDISTANT — NearestCells ties to the lower index, a=b=5 → s=0.
    // The seeds themselves score s=1 (a=0). Means: c0 {1, 1, 0} → 2/3,
    // c1 {1, 1} → 1.
    val emb = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(10f, 0f)),
      (2L, Seq(0f, 0f)), (3L, Seq(10f, 0f)), (4L, Seq(5f, 0f))
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    try {
      val got = Clustering.silhouette(emb, k = 2)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == Map(0L -> ((3L, 0.666667)), 1L -> ((2L, 1.0))), s"got $got")
    } finally graft.core.InternalCaches.release(spark)
  }
}
