package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic embedding corpus with planted cluster
  * structure — ground truth by construction for the similarity-search /
  * clustering layer, the vector analogue of [[SyntheticDocs]] (text) and
  * [[ArtificialPoints]] (geometry).
  *
  * Vector `i` belongs to center `i % nCenters`. Centers are hash-drawn
  * uniformly from [0, 10]^dim — in high dimension random centers sit
  * ~sqrt(dim · 16.7) ≈ 32 apart at dim 64 — and each vector adds ±noise/2
  * per-component jitter (intra-cluster distance ~1), so cluster membership
  * IS the nearest-neighbor ground truth: a vector's true top-k are its
  * center-mates, and the k lowest-id vectors are one seed per center
  * (ids cycle through centers). Every row is a pure function of (vec_id,
  * parameters): partitioning-, order- and run-independent.
  */
object SyntheticVectors {

  /** Distinct hash streams for center coordinates and per-vector noise —
    * the center stream's inputs (c·dim + j, a few thousand values) must
    * never collide with the noise stream's. */
  private val NoiseSalt = 0x517cc1b727220a95L

  private def unit(h: Long): Double =
    java.lang.Long.remainderUnsigned(h, 1000000L) / 1000000.0

  def clustered(spark: SparkSession, n: Long, dim: Int = 64,
                nCenters: Int = 64, noise: Double = 0.5): DataFrame = {
    import spark.implicits._
    require(n >= nCenters, s"need at least one vector per center: $n < $nCenters")
    require(dim >= 1 && nCenters >= 1 && noise >= 0.0)
    val d = dim; val k = nCenters; val nz = noise
    spark.range(n).map { id =>
      val c = (id % k).toInt
      val v = new Array[Float](d)
      var j = 0
      while (j < d) {
        val center = 10.0 * unit(graft.functions.BitMix.splitmix64(c.toLong * d + j))
        val jitter = nz * (unit(graft.functions.BitMix.splitmix64(id * d + j + NoiseSalt)) - 0.5)
        v(j) = (center + jitter).toFloat
        j += 1
      }
      (id, v)
    }.toDF("vec_id", "embedding")
  }
}
