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
  *  - per-batch `mapToPair/reduceByKey/collectAsMap` → per-batch
  *    `groupBy(item).count().collect()` merged into the driver histogram
  *    (the distributed part of the work — T6);
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
          // exact-histogram half: per-batch DISTRIBUTED combine for large
          // batches — the executors pre-aggregate (the reference's
          // reduceByKey, `G016HW3.java:91-95`) and the driver merges one
          // row per distinct item. Below the threshold (or on the
          // truncated final batch, whose cutoff is defined on arrival
          // order) the raw rows are already in hand for reservoir/sticky,
          // so a driver fold is free and skips a whole Spark job — the
          // combine only pays once shipping raw rows would dominate.
          if (!truncated && items.length >= 65536) {
            hist.merge(batch.groupBy("item").count().collect()
              .map(r => (r.getLong(0), r.getLong(1))))
          } else {
            var i = 0
            while (i < items.length) { hist.add(items(i)); i += 1 }
          }
          var i = 0
          while (i < items.length) {
            val it = items(i)
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
