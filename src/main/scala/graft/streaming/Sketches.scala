package graft.streaming

import scala.collection.mutable

/** Driver-held stream sketches with the reference's exact semantics
  * (`G016HW3.java:67-134`): an exact cumulative histogram, reservoir
  * sampling with m = ⌈1/phi⌉, and sticky sampling with
  * r = ln(1/(delta·phi))/epsilon. Sequential by definition — the sketch
  * state depends on arrival order — so these live on the driver inside
  * foreachBatch, exactly like the reference's foreachRDD closures. The
  * order-relaxed distributed variants are in [[DistributedSketches]].
  *
  * RNG is injected (seeded) so tests are deterministic where the reference
  * used `Math.random()`.
  */
object Sketches {

  /** Exact frequent items: full histogram, report count >= ⌈phi·n⌉. */
  final class ExactHistogram {
    val counts: mutable.HashMap[Long, Long] = mutable.HashMap.empty
    def add(item: Long, c: Long = 1L): Unit =
      counts.update(item, counts.getOrElse(item, 0L) + c)
    def frequent(phi: Double, n: Long): Seq[Long] = {
      val threshold = math.ceil(phi * n).toLong
      counts.iterator.filter(_._2 >= threshold).map(_._1).toSeq.sorted
    }
  }

  /** Reservoir sampling of size m: first m items fill the reservoir; item
    * t (0-based count so far = t) replaces a uniform slot w.p. m/(t+1). */
  final class Reservoir(val m: Int, rng: scala.util.Random) {
    val sample: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty
    private var t: Long = 0L
    def add(item: Long): Unit = {
      if (sample.length < m) sample += item
      else {
        val p = m.toDouble / (t + 1).toDouble
        if (rng.nextDouble() < p) sample(rng.nextInt(m)) = item
      }
      t += 1
    }
    /** Estimated frequent items = distinct sampled values. */
    def estimate: Seq[Long] = sample.distinct.sorted.toSeq
  }

  /** Sticky sampling: tracked items always increment; untracked admitted
    * w.p. r/n; report items with count >= (phi − epsilon)·n. */
  final class StickySampling(phi: Double, epsilon: Double, delta: Double,
                             n: Long, rng: scala.util.Random) {
    val r: Double = math.log(1.0 / (delta * phi)) / epsilon
    val table: mutable.HashMap[Long, Long] = mutable.HashMap.empty
    def add(item: Long): Unit =
      table.get(item) match {
        case Some(c) => table.update(item, c + 1)
        case None => if (rng.nextDouble() < r / n.toDouble) table.update(item, 1L)
      }
    def estimate: Seq[Long] = {
      val threshold = (phi - epsilon) * n.toDouble
      table.iterator.filter(_._2 >= threshold).map(_._1).toSeq.sorted
    }
  }
}
