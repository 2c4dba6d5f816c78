package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via flatMapGroupsWithState — the Structured
  * Streaming surface for semantics the built-in windowed aggregations
  * can't express (SURVEY maps the reference's driver-held sketches here
  * when they must scale past one machine).
  *
  * [[streamingDedup]] is the training-pipeline workhorse: exact first-seen
  * deduplication of an unbounded keyed stream (e.g. content hashes from
  * [[graft.ops.Text]] exact dedup, minhash band keys at ingest time).
  * State is per-key on the state store — partitioned, checkpointed,
  * recoverable; nothing driver-held.
  */
object StatefulOps {

  /** Emit only the first occurrence of each (key, token) pair; per-key
    * state is the set of seen tokens. For unbounded token domains swap the
    * Set for a Bloom filter buffer — the plumbing is identical. */
  def streamingDedup[K: Encoder](
      stream: Dataset[(K, Long)])(implicit kt: Encoder[(K, Long)]): Dataset[(K, Long)] = {
    implicit val stateEnc: Encoder[Set[Long]] = Encoders.kryo[Set[Long]]
    stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[Set[Long], (K, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Long)], state: GroupState[Set[Long]]) =>
          val seen = state.getOption.getOrElse(Set.empty[Long])
          val fresh = scala.collection.mutable.ArrayBuffer.empty[(K, Long)]
          var cur = seen
          rows.foreach { case (_, tok) =>
            if (!cur.contains(tok)) { cur += tok; fresh += ((key, tok)) }
          }
          if (cur.size != seen.size) state.update(cur)
          fresh.iterator
      }
  }

  /** Per-key running counters (mapGroupsWithState): emits (key, total) on
    * every batch that touches the key. */
  def runningCounts[K: Encoder](
      stream: Dataset[(K, Long)])(implicit kt: Encoder[(K, Long)]): Dataset[(K, Long)] = {
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    stream
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (K, Long)](GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(total)
          (key, total)
      }
  }
}
