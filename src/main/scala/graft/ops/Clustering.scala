package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Distributed KMeans over the `embeddings` table — the clustering pass a
  * training-data pipeline runs before semantic dedup, diversity sampling,
  * or per-cluster quota mixing (Lloyd 1982; the map-reduce formulation is
  * the standard one, e.g. Zaharia et al.'s original Spark paper uses it as
  * the motivating iterative workload).
  *
  * Scale shape — the whole point of the operator:
  * - Assignment is [[graft.functions.NearestCells]], the same opaque
  *   single-loop argmin expression the IVF index uses: centroids travel as
  *   expression state (k·dim doubles, broadcast with the task closure),
  *   the plan stays one projection, and NO join or shuffle touches the
  *   N-row side at all.
  * - The update step is a pair of hash aggregations: per-(cluster, dim)
  *   decimal component sums via posexplode (combine-friendly, exact, and
  *   order-free — the q42 centroid pattern), then k·dim tiny rows collect
  *   to the driver to become the next iteration's expression state. Per
  *   iteration the cluster sees one scan + one k·dim-row shuffle.
  * - Iteration happens on the DRIVER over k·dim doubles; the N-row frame
  *   is read `iters` times. Lloyd is the canonical "cache the working
  *   set" workload, so [[kmeans]] ENFORCES the cache: an input the
  *   caller did not persist is persisted internally via
  *   [[graft.core.InternalCaches]] rather than silently re-scanned per
  *   iteration.
  *
  * The q85 gate pins one assignment round (seed centroids = the k
  * lowest-vec_id vectors) against a DuckDB oracle that recomputes d² =
  * (‖x‖² − 2·x·c) + ‖c‖² with the exact same left-to-right dot folds, and
  * reduces each cluster to integer invariants (size, Σ vec_id) so the gate
  * hashes on exact values; the full Lloyd loop (movement, convergence,
  * partitioning-invariance) is property-tested in ClusteringSpec.
  */
object Clustering {

  private def nearestExpr(centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.NearestCells(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("embedding")),
        centroids, 1))

  /** Hard assignment of every vector to its nearest centroid (squared
    * euclidean, ties → lowest centroid index). Adds `cidx` (0-based index
    * into `centroids`); no shuffle — one native expression per row. */
  def assign(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "assign needs at least one centroid")
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.withColumn("cidx", nearestExpr(centroids))
  }

  /** One Lloyd update: exact decimal per-component means of each cluster
    * (order-free ⇒ identical across partitionings). Clusters that lost
    * every member keep their previous centroid — the standard
    * empty-cluster policy that keeps k stable. Returns k×dim doubles. */
  def updateCentroids(assigned: DataFrame,
                      prev: Array[Array[Double]]): Array[Array[Double]] = {
    val means = assigned
      .select(col("cidx"), posexplode(col("embedding")))
      .groupBy(col("cidx"), col("pos"))
      .agg((sum(col("col").cast(DoubleType).cast(DecimalType(28, 10)))
              .cast(DoubleType) / count(lit(1))).as("m"))
      .collect()
    val next = prev.map(_.clone())
    means.foreach { r =>
      next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    next
  }

  /** Full Lloyd loop: seed with the k lowest-vec_id vectors (deterministic
    * — kmeans++ would sharpen quality but costs determinism; the FFT
    * farthest-first seeding in [[Ann.ivfIndex]] is the engine's
    * quality-seeded variant), iterate assignment/update until centroids
    * stop moving or `maxIters`. Returns (final centroids, assigned frame).
    *
    * Cache contract, enforced (round 11): each iteration re-reads the
    * N-row frame, so an uncached input at 100 TB silently pays
    * `iters + 2` full scans. An input the caller did not persist is now
    * persisted INTERNALLY through [[graft.core.InternalCaches]]
    * (MEMORY_AND_DISK, released at the session's batch boundary) —
    * "callers cache upstream" remains the best practice (they control
    * the storage level and the unpersist moment) but is no longer a
    * silent footgun. Asserted in ClusteringSpec. */
  def kmeans(emb: DataFrame, k: Int, maxIters: Int = 10)
      : (Array[Array[Double]], DataFrame) = {
    val embC =
      if (emb.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        graft.core.InternalCaches.persist(emb)
      else emb
    var cents = seedCentroids(embC, k)._2
    var it = 0
    var moved = true
    while (moved && it < maxIters) {
      val next = updateCentroids(assign(embC, cents), cents)
      moved = !next.zip(cents).forall { case (a, b) => java.util.Arrays.equals(a, b) }
      cents = next
      it += 1
    }
    (cents, assign(embC, cents))
  }

  /** Seed-and-assign in one call (the q85 shape without the rollup) —
    * public for the 1M-vector bench anchor and composition. */
  def assignSeeded(emb: DataFrame, k: Int): DataFrame = {
    val (_, cents) = seedCentroids(emb, k)
    assign(emb, cents)
  }

  /** Deterministic seeds: the k lowest-vec_id vectors (bounded collect —
    * k rows, same contract as Ann's 256-row quantizer sample). Returns
    * (their vec_ids, their vectors as doubles). */
  private def seedCentroids(emb: DataFrame, k: Int): (Array[Long], Array[Array[Double]]) = {
    val seed = emb.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").cast(LongType), col("embedding")).collect()
    require(seed.length == k, s"corpus has ${seed.length} vectors, need >= $k seeds")
    (seed.map(_.getLong(0)),
     seed.map(_.getSeq[Float](1).map(_.toDouble).toArray))
  }

  /** Gate: one assignment round from the k lowest-vec_id seeds, reduced to
    * integer per-cluster invariants (cid = the seed's vec_id). */
  def qKmeansAssign(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val emb = Tables.embeddings(s, dir)
    val (cids, cents) = seedCentroids(emb, k)
    val cidLookup = array(cids.toIndexedSeq.map(lit(_)): _*)
    assign(emb, cents)
      .withColumn("cid", element_at(cidLookup, col("cidx") + 1))
      .groupBy(col("cid"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(col("vec_id")).cast(LongType).as("sum_vid"))
  }

  /** Semantic (cluster-bucketed) near-dup: assign every vector to its
    * nearest centroid, then run exact cosine pairs ONLY within each
    * cluster — the SemDeDup-style recipe (Abbas et al. 2023) that turns
    * the O(n²) all-pairs candidate space into Σ|cluster|². The trade is
    * recall at cluster boundaries: a pair split across two clusters is
    * never compared (measured against the exact q41 graph in
    * ClusteringSpec). Candidates come from an EQUI-join on the cluster
    * id — never a nested loop — and at 100 TB the within-cluster pair
    * step composes with [[Embeddings.cosineNearDup]]'s block outer
    * product per cluster if clusters outgrow a task (k is the knob: more
    * centroids → smaller clusters → fewer candidates, lower recall).
    * Same scoring shapes as q41 (graft_dot, precomputed sqrt norms,
    * round 6), so the oracle is the q85 assignment CTE + the q41 pair
    * predicate restricted to same-cluster. */
  def semanticNearDup(emb: DataFrame, k: Int, threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val (_, cents) = seedCentroids(emb, k)
    val assigned = graft.core.InternalCaches.persist(
      assign(emb, cents)
        .withColumn("nrm", sqrt(expr("graft_dot(embedding, embedding)")))
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cidx")))
    val a = assigned.select(col("cidx"), col("vec_id").as("d1"),
      col("embedding").as("v1"), col("nrm").as("n1"))
    val b = assigned.select(col("cidx"), col("vec_id").as("d2"),
      col("embedding").as("v2"), col("nrm").as("n2"))
    a.join(b, Seq("cidx")).filter(col("d1") < col("d2"))
      .withColumn("sim", round(expr("graft_dot(v1, v2)") / (col("n1") * col("n2")), 6))
      .filter(col("sim") >= threshold)
      .select(col("d1"), col("d2"), col("sim"))
  }

  def qSemanticDedup(s: SparkSession, dir: String): DataFrame =
    semanticNearDup(Tables.embeddings(s, dir), k = 8, threshold = 0.4)

  /** Per-cluster diversity sampling: cap every semantic cluster's
    * contribution at `perCluster` members, ranked by a per-row score —
    * the "cluster then cap" mix-balancing step (the embedding-space
    * analogue of q81's per-source quota). Ranking runs through the
    * bounded-heap [[graft.plans.TopK]] operator, NOT a window: the
    * shuffle carries ≤ k rows per cluster per input partition and nothing
    * sorts a whole cluster (at 100 TB a hot cluster is exactly the
    * partition a window would die on). Score here is the vector norm
    * (deterministic: the same left-to-right sqrt∘dot both engines fold),
    * vec_id breaks ties; a model-based quality column would slot into the
    * same orderBy. */
  def clusterSample(emb: DataFrame, k: Int, perCluster: Int): DataFrame = {
    val (cids, cents) = seedCentroids(emb, k)
    val cidLookup = array(cids.toIndexedSeq.map(lit(_)): _*)
    val scored = assign(emb, cents)
      .withColumn("cid", element_at(cidLookup, col("cidx") + 1))
      .withColumn("nrm", sqrt(expr("graft_dot(embedding, embedding)")))
      .select(col("cid"), col("vec_id"), col("nrm"))
    graft.plans.TopK.perKey(scored,
        keys = Seq("cid"),
        orderBy = Seq(graft.plans.TopK.desc("nrm"), graft.plans.TopK.asc("vec_id")),
        k = perCluster)
      .select(col("cid"), col("vec_id"), round(col("nrm"), 6).as("nrm"))
  }

  def qClusterSample(s: SparkSession, dir: String): DataFrame =
    clusterSample(Tables.embeddings(s, dir), k = 8, perCluster = 5)

  /** Per-cluster CENTROID silhouette — the clustering-quality eval after
    * assignment (the "simplified silhouette", Hruschka et al. 2004: a =
    * distance to the OWN centroid, b = min distance to any OTHER
    * centroid, s = (b−a)/max(a,b) ∈ [−1,1]) — O(n·k) where the classic
    * Rousseeuw 1987 pairwise form is O(n²) and dead at corpus scale.
    * Near-zero or negative cluster means flag a k that is splitting or
    * merging real structure — the go/no-go read before the q87/q89
    * downstream passes trust the clustering.
    *
    * Scale shape: ONE projection riding the scan — all k squared
    * distances materialize per row as (naa − 2·dot_j) + ncc_j with the
    * centroids as plan literals through the codegen'd graft_dot (the q85
    * assignment parity shapes), own/other picked by array index, no
    * join, no fan-out — then ONE k-key rollup with map-side partial
    * decimal sums (≤ k·partitions wire rows, the q85 contract). Floats
    * pinned: d² clamps at 0 (a vector equal to a float-degenerate
    * centroid must not sqrt a −ε), per-row s rounds to 9, decimal sums,
    * round-6 means; a=b=0 guards to 0. */
  def silhouette(emb: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val (cids, cents) = seedCentroids(emb, k)
    def litArr(c: Array[Double]) =
      c.map(v => s"CAST($v AS DOUBLE)").mkString("array(", ", ", ")")
    def nccOf(c: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }
    val naa = expr("graft_dot(embedding, embedding)")
    val d2s = cents.map { c =>
      (naa - lit(2.0) * expr(s"graft_dot(embedding, ${litArr(c)})")) +
        lit(nccOf(c))
    }
    val cidLookup = array(cids.toIndexedSeq.map(lit(_)): _*)
    assign(emb, cents)
      .withColumn("d2s", array(d2s.toIndexedSeq: _*))
      .withColumn("a", sqrt(greatest(element_at(col("d2s"), col("cidx") + 1), lit(0.0))))
      .withColumn("b", sqrt(greatest(
        expr("array_min(filter(d2s, (x, i) -> i != cidx))"), lit(0.0))))
      .withColumn("s", when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
        .otherwise(round((col("b") - col("a")) / greatest(col("a"), col("b")), 9)))
      .groupBy(col("cidx"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(col("s").cast(DecimalType(28, 12))).cast(DoubleType).as("ssum"))
      .select(element_at(cidLookup, col("cidx") + 1).as("cid"), col("n"),
        round(col("ssum") / col("n"), 6).as("mean_sil"))
  }

  def qSilhouette(s: SparkSession, dir: String): DataFrame =
    silhouette(Tables.embeddings(s, dir), k = 8)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_kmeans_assign" -> (qKmeansAssign _),
    "q87_semantic_dedup" -> (qSemanticDedup _),
    "q89_cluster_sample" -> (qClusterSample _),
    "q170_silhouette"   -> (qSilhouette _),
  )

  /** Shared assignment CTEs: d² recomputed with the exact NearestCells
    * shapes — each dot/norm is a left-to-right list_dot_product fold (the
    * q40-proven parity), combined as naa - 2.0*dot + ncc, which is
    * left-associative in both engines. `assigned(vec_id, cid)` is the
    * nearest-centroid map. */
  private val AssignOracleCtes: String =
    """WITH c AS MATERIALIZED (
         SELECT vec_id AS cid,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
         FROM embeddings WHERE vec_id < 8),
       cn AS MATERIALIZED (
         SELECT cid, cv, list_dot_product(cv, cv) AS ncc FROM c),
       a AS (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS av
             FROM embeddings),
       an AS (SELECT vec_id, av, list_dot_product(av, av) AS naa FROM a),
       d AS (SELECT an.vec_id, cn.cid,
               an.naa - 2.0 * list_dot_product(an.av, cn.cv) + cn.ncc AS d2
             FROM an CROSS JOIN cn),
       best AS (SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2 ASC, cid ASC) AS rk
                FROM d),
       assigned AS MATERIALIZED (
         SELECT vec_id, cid FROM best WHERE rk = 1)"""

  // q87's pair scoring is q41's CosSql shape restricted to same-cluster
  private val PairCosSql: String =
    """list_dot_product(list_transform(x.embedding, v -> CAST(v AS DOUBLE)),
                        list_transform(y.embedding, v -> CAST(v AS DOUBLE)))
       / (sqrt(list_dot_product(list_transform(x.embedding, v -> CAST(v AS DOUBLE)),
                                list_transform(x.embedding, v -> CAST(v AS DOUBLE))))
        * sqrt(list_dot_product(list_transform(y.embedding, v -> CAST(v AS DOUBLE)),
                                list_transform(y.embedding, v -> CAST(v AS DOUBLE)))))"""

  val oracles: Map[String, String] = Map(
    "q85_kmeans_assign" ->
      s"""$AssignOracleCtes
         SELECT cid, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(vec_id) AS BIGINT) AS sum_vid
         FROM assigned GROUP BY cid""",
    "q87_semantic_dedup" ->
      s"""$AssignOracleCtes
         SELECT x.vec_id AS d1, y.vec_id AS d2, round($PairCosSql, 6) AS sim
         FROM (SELECT e.vec_id, e.embedding, s.cid
               FROM embeddings e JOIN assigned s USING (vec_id)) x
         JOIN (SELECT e.vec_id, e.embedding, s.cid
               FROM embeddings e JOIN assigned s USING (vec_id)) y
           ON x.cid = y.cid AND x.vec_id < y.vec_id
         WHERE round($PairCosSql, 6) >= 0.4""",
    // q89's oracle is the naive window rank the bounded-heap operator
    // must equal row-for-row (the q62 relationship); ordering runs on the
    // RAW norm double (identical sqrt∘fold both engines), rounding is
    // output-only
    "q89_cluster_sample" ->
      s"""$AssignOracleCtes,
         nr AS (SELECT e.vec_id, s.cid,
                  sqrt(list_dot_product(
                    list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                    list_transform(e.embedding, x -> CAST(x AS DOUBLE)))) AS nrm
                FROM embeddings e JOIN assigned s USING (vec_id))
         SELECT cid, vec_id, round(nrm, 6) AS nrm FROM (
           SELECT cid, vec_id, nrm,
             row_number() OVER (PARTITION BY cid
               ORDER BY nrm DESC, vec_id ASC) AS rk
           FROM nr) t
         WHERE rk <= 5""",
    // q170: the d-table already holds every (vec_id, cid, d²) the engine
    // materializes per row; own/other split by the assigned map, the
    // identical clamp/sqrt/guard/round chain
    "q170_silhouette" ->
      s"""$AssignOracleCtes,
         own AS (SELECT d.vec_id, s.cid, greatest(d.d2, 0.0) AS own
                 FROM d JOIN assigned s
                   ON d.vec_id = s.vec_id AND d.cid = s.cid),
         oth AS (SELECT d.vec_id, greatest(min(d.d2), 0.0) AS oth
                 FROM d JOIN assigned s
                   ON d.vec_id = s.vec_id AND d.cid <> s.cid
                 GROUP BY d.vec_id),
         sv AS (SELECT o.cid,
                  CASE WHEN greatest(sqrt(o.own), sqrt(t.oth)) = 0.0 THEN 0.0
                       ELSE round((sqrt(t.oth) - sqrt(o.own))
                         / greatest(sqrt(o.own), sqrt(t.oth)), 9) END AS s
                FROM own o JOIN oth t USING (vec_id))
         SELECT cid, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6)
             AS mean_sil
         FROM sv GROUP BY cid""",
  )
}
