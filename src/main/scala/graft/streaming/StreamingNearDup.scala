package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection at ingest time: MinHash band keys per
  * document, first-seen state per band bucket, candidate-pair stream out.
  *
  * Batch near-dup (graft.ops.Text.qMinHashLsh) re-scans the corpus; at
  * training-data ingest rates you want the dedup decision as documents
  * arrive. Design constraints that shape this pipeline:
  *  - signatures are computed as per-row projections (native
  *    graft_shingles + per-row HOF mins), NOT as a groupBy aggregation —
  *    append-mode streams forbid unwatermarked aggregations, projections
  *    are free;
  *  - band buckets are the grouping key for flatMapGroupsWithState, so
  *    state is partitioned/checkpointed by the state store and scales
  *    horizontally — nothing driver-held;
  *  - state per bucket is only the canonical (first-seen) doc id — memory
  *    is O(#non-empty buckets), not O(#documents).
  *
  * Emitted rows are *candidate* pairs (same band bucket). Exact Jaccard
  * re-verification happens downstream on the candidate stream — same
  * two-phase contract as the batch LSH operator.
  */
object StreamingNearDup {

  val NumHashes = 32
  val Bands = 16
  val Rows = 2

  /** doc stream (doc_id, text) → banded stream (doc_id, band, bkey). */
  def bandKeys(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sig = docs
      .withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= 3)
      .withColumn("hs", expr("graft_shingles(t, 3)"))
      .withColumn("sig", array((0 until NumHashes).map(i =>
        array_min(expr(s"transform(hs, h -> xxhash64($i, h))"))): _*))
    sig.select(col("doc_id"), posexplode(array((0 until Bands).map(b =>
        xxhash64(lit(b) +: (0 until Rows).map(r => col("sig").getItem(b * Rows + r)): _*)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
  }

  final case class CandidatePair(canonical_id: Long, duplicate_id: Long, band: Int)

  /** Candidate near-dup pairs across the whole stream history: the first
    * doc seen in a band bucket becomes its canonical; later docs in the
    * same bucket emit a pair. */
  def candidatePairs(docs: DataFrame): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandKeys(docs)
      .select(col("band").cast("int"), col("bkey"), col("doc_id"))
      .as[(Int, Long, Long)]
      .groupByKey { case (band, bkey, _) => (band, bkey) }
      .flatMapGroupsWithState[Long, CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[(Int, Long, Long)], state: GroupState[Long]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
          var canonical = state.getOption.getOrElse(-1L)
          // stable order inside the batch so the smallest id is canonical
          rows.map(_._3).toSeq.sorted.foreach { id =>
            if (canonical < 0) canonical = id
            else if (id != canonical) out += CandidatePair(canonical, id, key._1)
          }
          if (state.getOption.isEmpty && canonical >= 0) state.update(canonical)
          out.iterator
      }
  }

  /** Distinct (canonical, duplicate) pairs per micro-batch sink — a doc
    * hitting several bands of the same canonical collapses to one pair. */
  def distinctPairs(pairs: Dataset[CandidatePair]): DataFrame =
    pairs.toDF().select(col("canonical_id"), col("duplicate_id")).dropDuplicates()
}
