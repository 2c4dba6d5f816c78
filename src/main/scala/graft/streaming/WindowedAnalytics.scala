package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Modern streaming surface beyond the reference (which is count-capped,
  * processing-time only — SURVEY §2.7): event-time windowed aggregation
  * with watermarked late-data handling, for the `events`-shaped stream.
  * Pure plan builders — callers attach readStream sources and
  * writeStream sinks; tested with MemoryStream.
  */
object WindowedAnalytics {

  /** Tumbling event-time window counts with a late-data watermark. */
  def tumblingCounts(stream: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
              col("event_type"), col("n"), col("sum_v"))

  /** Sliding windows (length/slide) over the same stream. */
  def slidingCounts(stream: DataFrame, windowLen: String = "1 hour",
                    slide: String = "15 minutes", watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Session windows (gap-based) — the streaming twin of Events.qSessionize. */
  def sessionCounts(stream: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
              col("session_window.end").as("s_end"),
              col("user_id"), col("n_events"))
}
