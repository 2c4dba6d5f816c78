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
}
