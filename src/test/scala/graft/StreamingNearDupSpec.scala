package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingNearDup

class StreamingNearDupSpec extends SparkSpec {

  test("near-dup candidates detected within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val textB = "completely different words appear in this second document about spark engines and parquet files"
    val mem = MemoryStream[(Long, String)]
    val pairs = StreamingNearDup.candidatePairs(mem.toDF().toDF("doc_id", "text"))
    val q = pairs.toDF().writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").start()
    mem.addData((1L, textA), (2L, textA), (3L, textB))   // batch 1: 2 dups of 1
    q.processAllAvailable()
    mem.addData((4L, textA))                             // batch 2: dup across batches
    q.processAllAvailable()
    q.stop()
    val found = spark.table("neardup_test")
      .select("canonical_id", "duplicate_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)), s"in-batch dup missed: $found")
    assert(found.contains((1L, 4L)), s"cross-batch dup missed: $found")
    assert(!found.exists(p => p._1 == 3L || p._2 == 3L), s"false positive on distinct doc: $found")
  }
}
