package graft

import org.apache.spark.sql.functions._
import graft.ops.{Pipeline, Text}

class PipelineSpec extends SparkSpec {

  test("pipeline invariants: yields bounded by input, near-dups removed, bins packed") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val clean = Pipeline.cleanCorpus(spark, sfDir).cache()
    val nClean = clean.count()
    assert(nClean > 0 && nClean <= nDocs)
    // every near-dup component lost its non-canonical members
    val losers = Text.qMinHashLsh(spark, sfDir)
      .select(col("d2")).distinct().collect().map(_.getLong(0)).toSet
    val kept = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(losers.intersect(kept).isEmpty, s"near-dup losers survived: ${losers.intersect(kept)}")
    // chunks cover only kept docs; bins respect the running-total rule
    val chunks = Pipeline.trainingChunks(spark, sfDir).cache()
    assert(chunks.select("doc_id").distinct().collect().map(_.getLong(0)).toSet.subsetOf(kept))
    val binTotals = chunks.groupBy(col("lang"), col("bin"))
      .agg(sum(col("chunk_len")).as("tok")).collect()
    // a packed bin never exceeds budget + one max-size chunk (32)
    assert(binTotals.forall(_.getLong(2) <= 8192 + 32))
    clean.unpersist(); chunks.unpersist()
  }

  test("pipeline summary query returns one row per language") {
    val rows = Pipeline.qPipelineSummary(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))  // docs_kept <= docs_in
      assert(r.getLong(3) >= r.getLong(2))  // chunks >= kept docs
    }
  }

  test("pipeline yield on the planted corpus matches first-principles goldens") {
    // nBase = 20000, nPlant = 500, 40 tokens/doc, 4 even languages:
    //   docs_in   = 20500 / 4 = 5125 per language (ids dense, range % 4 == 0)
    //   docs_kept = 5000 — every doc passes quality (40 tokens, zero
    //     stopwords), exact dedup keeps all, and LSH drops EXACTLY the 500
    //     planted copies (d2 of each pair)
    //   n_chunks  = 10000 — stride 24 over 40 tokens → 2 chunks (32 + 16)
    //   n_bins    = 30 — per-language tokens 5000 × 48 = 240000; exclusive
    //     prefixes step by ≤ 32 < 8192, so bins are contiguous:
    //     floor((240000 − 16) / 8192) + 1
    // Every number derives from the corpus construction, so a regression in
    // ANY pipeline stage (quality, dedup, LSH recall, chunking arithmetic,
    // prefix-sum packing) moves one of them.
    val docs = graft.sources.SyntheticDocs.planted(spark, nBase = 20000L, nPlant = 500L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rows = Pipeline.summaryOver(docs).collect()
      assert(rows.length == 4, s"expected 4 languages, got ${rows.toSeq}")
      for (r <- rows) {
        assert(r.getLong(1) == 5125L, s"docs_in: $r")
        assert(r.getLong(2) == 5000L, s"docs_kept: $r")
        assert(r.getLong(3) == 10000L, s"n_chunks: $r")
        assert(r.getLong(4) == 30L, s"n_bins: $r")
      }
    } finally { docs.unpersist(); graft.core.InternalCaches.release(spark) }
  }
}
