package graft.streaming

import java.util.concurrent.Semaphore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's HW3 pipeline (`G016HW3.java:39-231`) on Structured
  * Streaming: consume a stream of integers until exactly `n` items have
  * been processed (truncating the final micro-batch), maintaining three
  * sketches — exact histogram, reservoir, sticky sampling — then report.
  *
  * Reference → engine mapping:
  *  - DStream `foreachRDD` → `writeStream.foreachBatch` (T1);
  *  - per-batch `mapToPair/reduceByKey/collectAsMap` → a driver fold of the
  *    batch rows into the histogram (T6): the raw arrival-order rows must
  *    reach the driver anyway for reservoir/sticky, so a distributed
  *    pre-aggregation would be a second action on the same batch, not a
  *    saving — the distributed analogue lives in [[DistributedSketches]];
  *  - semaphore + `ssc.stop` → semaphore + `query.stop()` from the main
  *    thread (T2);
  *  - the n-item cutoff truncates the final batch in arrival order; with a
  *    file/socket source a micro-batch arrives as a single ordered
  *    partition, matching the reference's `zipWithIndex().filter` cut.
  *
  * The reservoir/sticky updates are inherently sequential driver state
  * (SURVEY §7.4 risk 3) — by design, like the reference; the distributed
  * order-relaxed variants live in [[DistributedSketches]].
  */
object FrequentItemsJob {

  final case class Report(
      n: Long,
      histogramSize: Int,
      trueFrequent: Seq[Long],
      reservoirSample: Seq[Long],
      reservoirEstimate: Seq[Long],
      stickyTableSize: Int,
      stickyEstimate: Seq[Long])

  /** Run over a streaming DataFrame with a single LongType `item` column.
    * Blocks until n items are processed, then stops the query. */
  def run(spark: SparkSession, stream: DataFrame, n: Long, phi: Double,
          epsilon: Double, delta: Double, seed: Long = 42L): Report = {
    val hist = new Sketches.ExactHistogram
    val m = math.ceil(1.0 / phi).toInt
    val reservoir = new Sketches.Reservoir(m, new scala.util.Random(seed))
    val sticky = new Sketches.StickySampling(phi, epsilon, delta, n, new scala.util.Random(seed + 1))
    var processed = 0L
    val done = new Semaphore(0)

    val query: StreamingQuery = stream
      .select(col("item").cast("long").as("item"))
      .writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("10 milliseconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (processed < n) {
          val remaining = n - processed
          // arrival-order array; truncate the final batch like the
          // reference's zipWithIndex().filter (G016HW3.java:84-87). The
          // raw rows are required by reservoir/sticky, whose state is
          // order-exact by definition (reference semantics).
          val items0 = batch.select("item").collect().map(_.getLong(0))
          val truncated = items0.length > remaining
          val items = if (truncated) items0.take(remaining.toInt) else items0
          processed += items.length
          // All three sketches fold the already-collected rows: reservoir
          // and sticky are order-exact by reference semantics, so the raw
          // arrival-order array MUST reach the driver every batch — which
          // means a distributed groupBy+count combine for the histogram
          // could only ever ADD a second full action on the same batch,
          // never replace the collect. (An earlier revision ran such a
          // combine for >= 64k-row batches; it was strictly extra work.)
          // The genuinely distributed, order-relaxed analogues — mergeable
          // Aggregators with executor-side partial aggregation — live in
          // [[DistributedSketches]].
          var i = 0
          while (i < items.length) {
            val it = items(i)
            hist.add(it)
            reservoir.add(it)
            sticky.add(it)
            i += 1
          }
          if (processed >= n) done.release()
        }
      }
      .start()

    done.acquire()
    query.stop()
    query.awaitTermination()

    Report(
      n = processed,
      histogramSize = hist.counts.size,
      trueFrequent = hist.frequent(phi, processed),
      reservoirSample = reservoir.sample.toSeq,
      reservoirEstimate = reservoir.estimate,
      stickyTableSize = sticky.table.size,
      stickyEstimate = sticky.estimate)
  }
}
