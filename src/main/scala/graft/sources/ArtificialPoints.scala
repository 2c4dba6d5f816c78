package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic clustered point generator shaped like the reference's
  * artificial1M corpus (`Homework_2/Data/artificial1M_9_100.csv`, 1 000 108
  * points — stripped from the repo, `/root/reference/.MISSING_LARGE_BLOBS`)
  * and its TEST 2 recipe (`Homework_2/Assignment/Filled TableHW2.docx`):
  * dense clusters plus a small set of planted, well-isolated outliers.
  *
  * The engine's published-anchor validation tops out at uber-100k; this
  * generator lets Bench and the specs exercise MRFFT / MRApproxOutliers at
  * the reference's published 1M-point scale with a KNOWN ground truth (the
  * planted outliers), since the original blobs are unavailable.
  *
  * Every coordinate is a pure function of the row id (splitmix64 bit mix →
  * uniform draws), generated distributively from `spark.range` with a FIXED
  * partition count — no driver loop, no RNG state, bit-identical across
  * runs, machines and parallelism settings.
  *
  * Geometry: `nClusters` uniform-disc clusters of radius `clusterRadius` on
  * a grid with `clusterSpacing`, plus `nOutliers` points on a far ring
  * (radius `outlierRing` around the grid centroid, pairwise separation
  * 2π·ring/nOutliers ≫ any working D) — so for any D within an order of
  * magnitude of the cluster covering radius, MRApproxOutliers at M=10 must
  * report exactly the planted points as `sure` and nothing `uncertain`.
  */
object ArtificialPoints {

  private def mix(z0: Long): Long = graft.functions.BitMix.splitmix64(z0)

  /** Uniform double in [0, 1) from the top 53 bits of a mixed hash. */
  private def unit(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  /** 1 000 008 cluster points + 100 outliers = 1 000 108 rows by default —
    * the exact artificial1M point count. Columns: (id, x, y). */
  def generate(spark: SparkSession,
               nClusterPts: Long = 1000008L,
               nOutliers: Int = 100,
               nClusters: Int = 9,
               clusterSpacing: Double = 20.0,
               clusterRadius: Double = 1.0,
               outlierRing: Double = 300.0,
               numPartitions: Int = 64): DataFrame = {
    import spark.implicits._
    val side = math.ceil(math.sqrt(nClusters.toDouble)).toInt
    val mid = (side - 1) * clusterSpacing / 2.0
    val nc = nClusters; val sp = clusterSpacing; val cr = clusterRadius
    val ring = outlierRing; val nOut = nOutliers; val nClu = nClusterPts
    spark.range(0L, nClusterPts + nOutliers, 1L, numPartitions)
      .map { id =>
        if (id < nClu) {
          val c = (id % nc).toInt
          val cx = (c % side) * sp
          val cy = (c / side) * sp
          // uniform in a disc: r = R·√u keeps density constant — no thin
          // Gaussian tail that could leak stray "uncertain" cells.
          // StrictMath (not Math) for cos/sin: Math's intrinsics carry a
          // 1-ulp platform tolerance, StrictMath is bit-specified — the
          // pinned radius goldens in GeometrySpec must hold on any JVM
          val r = cr * math.sqrt(unit(mix(2 * id + 1)))
          val th = 2.0 * math.Pi * unit(mix(2 * id + 2))
          (id, cx + r * StrictMath.cos(th), cy + r * StrictMath.sin(th))
        } else {
          val k = (id - nClu).toInt
          val th = 2.0 * math.Pi * k / nOut
          (id, mid + ring * StrictMath.cos(th), mid + ring * StrictMath.sin(th))
        }
      }
      .toDF("id", "x", "y")
  }
}
