package graft

import graft.core.InternalCaches

class InternalCachesSpec extends SparkSpec {

  test("release after a representative query mix leaves no operator-internal storage") {
    // queries whose operators persist internal fan-out frames: exact
    // Jaccard (shingle + prefix frames), MinHash LSH (per-doc agg),
    // TF-IDF (tf), SimHash (banded)
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    for (q <- Seq("q34_ngram_jaccard", "q35_minhash_lsh", "q57_tfidf",
                  "q36_simhash_pairs"))
      SparkEntry.queries(q)(spark, sfDir).collect()
    assert(InternalCaches.registeredCount(spark) > 0,
      "the mix should have registered operator-internal persists")
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(baseline).nonEmpty,
      "the mix should have materialized cached blocks")
    InternalCaches.release(spark)
    assert(InternalCaches.registeredCount(spark) == 0)
    // unpersist is async (blocking = false): poll briefly for the blocks
    // to drain rather than flaking on scheduler timing
    val deadline = System.nanoTime() + 10_000_000_000L
    def leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(baseline)
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(leaked.isEmpty, s"operator-internal RDDs still persisted: $leaked")
  }

  test("looping one query registers ONE handle (plan-keyed dedupe), re-persist after release works") {
    InternalCaches.release(spark)
    for (_ <- 1 to 5)
      SparkEntry.queries("q34_ngram_jaccard")(spark, sfDir).collect()
    // q34 persists two internal frames (shingles, prefix) — but looping
    // it 5x must not register 5x the handles
    val n = InternalCaches.registeredCount(spark)
    assert(n > 0 && n <= 2, s"expected plan-keyed handle dedupe, got $n handles")
    InternalCaches.release(spark)
    assert(InternalCaches.registeredCount(spark) == 0)
    // released plans re-persist cleanly on the next run
    assert(SparkEntry.queries("q34_ngram_jaccard")(spark, sfDir).collect().nonEmpty)
    assert(InternalCaches.registeredCount(spark) > 0)
    InternalCaches.release(spark)
  }
}
