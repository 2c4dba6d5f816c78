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
  *   is read `iters` times (callers cache upstream once — Lloyd is the
  *   canonical "cache the working set" workload).
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
    * Callers cache `emb` upstream — each iteration re-reads it. */
  def kmeans(emb: DataFrame, k: Int, maxIters: Int = 10)
      : (Array[Array[Double]], DataFrame) = {
    var cents = seedCentroids(emb, k)._2
    var it = 0
    var moved = true
    while (moved && it < maxIters) {
      val next = updateCentroids(assign(emb, cents), cents)
      moved = !next.zip(cents).forall { case (a, b) => java.util.Arrays.equals(a, b) }
      cents = next
      it += 1
    }
    (cents, assign(emb, cents))
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
    val cidLookup = array(cids.map(lit(_)): _*)
    assign(emb, cents)
      .withColumn("cid", element_at(cidLookup, col("cidx") + 1))
      .groupBy(col("cid"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(col("vec_id")).cast(LongType).as("sum_vid"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_kmeans_assign" -> (qKmeansAssign _),
  )

  /** d² recomputed with the exact NearestCells shapes: each dot/norm is a
    * left-to-right list_dot_product fold (the q40-proven parity), combined
    * as naa - 2.0*dot + ncc — left-associative in both engines. */
  val oracles: Map[String, String] = Map(
    "q85_kmeans_assign" ->
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
                  FROM d)
         SELECT cid, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(vec_id) AS BIGINT) AS sum_vid
         FROM best WHERE rk = 1 GROUP BY cid""",
  )
}
