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
    * state is the INSERTION-ORDERED set of seen tokens, capped at
    * `maxTokens` (round 12 — the r11 version grew without bound, the one
    * remaining unbounded-state streaming operator).
    *
    * BOUNDED-state contract: while a key has seen ≤ `maxTokens` distinct
    * tokens the dedup is EXACT. Past the cap the oldest-first-seen tokens
    * are evicted (FIFO by first arrival), so an evicted token that
    * re-arrives is re-emitted — the error mode is a duplicate passing
    * through, NEVER a genuinely-new token being dropped, which is the
    * safe direction for an ingest filter (downstream batch dedup catches
    * stragglers; dropped data is unrecoverable). The default cap holds
    * ~8 MB/key of state (2²⁰ longs); sizing it to the key's expected
    * distinct-token horizon makes the approximation window explicit. A
    * Bloom-backed variant trades the FIFO window for a small
    * false-POSITIVE (over-suppression) rate — the wrong error direction
    * here, which is why the exact-window form is the default.
    *
    * CHECKPOINT COMPATIBILITY: the round-12 cap changed the state encoding
    * from kryo[Set[Long]] to kryo[Vector[Long]] (insertion order is what
    * makes FIFO eviction possible). A query restarted from a checkpoint
    * written by the pre-cap operator will fail deserializing the old
    * Set-encoded state — restart such a query with a NEW checkpoint
    * location (the stream's source is the system of record; re-ingesting
    * re-emits at-least-once, the operator's documented error direction).
    * Checkpoints written by this version restart cleanly (covered by the
    * kill-and-restart recovery spec). */
  def streamingDedup[K: Encoder](
      stream: Dataset[(K, Long)],
      maxTokens: Int = 1 << 20)(implicit kt: Encoder[(K, Long)]): Dataset[(K, Long)] = {
    require(maxTokens >= 1, s"maxTokens must be positive, got $maxTokens")
    implicit val stateEnc: Encoder[Vector[Long]] = Encoders.kryo[Vector[Long]]
    stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[Vector[Long], (K, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Long)], state: GroupState[Vector[Long]]) =>
          // state carries first-arrival order so eviction is FIFO, not
          // value-ordered: a LinkedHashSet rebuild per touched key is
          // O(state) — the same per-batch cost the membership checks pay
          val seen = scala.collection.mutable.LinkedHashSet.empty[Long] ++
            state.getOption.getOrElse(Vector.empty[Long])
          val fresh = scala.collection.mutable.ArrayBuffer.empty[(K, Long)]
          rows.foreach { case (_, tok) =>
            if (!seen.contains(tok)) { seen += tok; fresh += ((key, tok)) }
          }
          if (fresh.nonEmpty) {
            while (seen.size > maxTokens) seen -= seen.head
            state.update(seen.toVector)
          }
          fresh.iterator
      }
  }

  /** Streaming twin of [[graft.ops.Events.hourlyAnomalies]]: per-user
    * hourly counts held as flatMapGroupsWithState state (hour → count,
    * partitioned on the state store, checkpointed), and on every batch
    * that touches a user the SAME pure-integer cleared-form 3σ test runs
    * over the user's retained hourly history — (c·H − S)² > 9·(H·SS − S²)
    * with c·H > S — emitting the user's currently-flagged hours. After a
    * full replay the last emission per user equals the batch operator's
    * flag set exactly (asserted in spec): integer state plus an
    * order-free test means ingest-time and batch answers cannot diverge.
    * Input rows are (user_id, hour_bucket) — epoch ms div 3 600 000,
    * the batch operator's bucketing.
    *
    * BOUNDED state (round 11): a continuously-running ingest operator
    * must not grow state without limit, so each user retains only the
    * `maxHours` NEWEST hour buckets (default 8 784 ≈ one year of hourly
    * state, ≤ ~140 KB/user) — older buckets are evicted on update, making
    * the long-horizon semantics a trailing-window 3σ baseline (the
    * rolling variant of the batch operator, which sees all history; the
    * two agree exactly for any user whose activity spans ≤ maxHours,
    * which is what the convergence spec replays). Eviction is by hour
    * bucket VALUE, not arrival order, so late data cannot pin stale
    * state.
    *
    * CONSUMPTION contract — latest-emission-wins: Append mode cannot
    * retract, so every batch that touches a user re-emits the user's
    * full CURRENT flag set and a sink must treat the latest emission per
    * user as authoritative (a batch emitting nothing for a touched user
    * means "no flags"). Sinks that need upsert semantics key on
    * (user_id) and replace; the spec's converged-set comparison encodes
    * exactly this contract. */
  def streamingAnomalies(
      stream: Dataset[(Long, Long)],
      maxHours: Int = 8784): Dataset[(Long, Long, Long)] = {
    require(maxHours >= 1, s"maxHours must be positive, got $maxHours")
    implicit val stateEnc: Encoder[Map[Long, Long]] = Encoders.kryo[Map[Long, Long]]
    implicit val outEnc: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    implicit val inEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long], (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Map[Long, Long]]) =>
          val m = scala.collection.mutable.Map.empty[Long, Long] ++
            state.getOption.getOrElse(Map.empty[Long, Long])
          rows.foreach { case (_, hr) => m(hr) = m.getOrElse(hr, 0L) + 1L }
          if (m.size > maxHours) {
            // evict the OLDEST hour buckets beyond the retention window
            val cutoff = m.keysIterator.toArray.sorted.apply(m.size - maxHours)
            m.filterInPlace { case (hr, _) => hr >= cutoff }
          }
          state.update(m.toMap)
          val h = m.size.toLong
          var s = 0L; var ss = 0L
          m.valuesIterator.foreach { c => s += c; ss += c * c }
          m.iterator.collect {
            case (hr, c) if c * h > s &&
                (c * h - s) * (c * h - s) > 9L * (h * ss - s * s) =>
              (user, hr, c)
          }
      }
  }

  /** Streaming twin of [[graft.ops.Embeddings.driftPsi]]'s counting half:
    * per-bucket (n_a, n_b) running totals held as state, keyed by the
    * histogram bucket a stateless map assigns upstream (the SAME
    * [[graft.ops.Embeddings.driftBucketExpr]] the batch gate uses — input
    * rows are (bucket, is_a)). Every batch that touches a bucket re-emits
    * its current totals; the converged answer is the LATEST emission per
    * bucket — mapGroupsWithState runs in UPDATE output mode (the specs'
    * outputMode("update")), whose sink contract is exactly
    * latest-emission-per-key-wins — which feeds
    * [[graft.ops.Embeddings.psiFromCounts]], asserted equal to the batch
    * PSI after a full replay.
    *
    * State is bounded BY CONSTRUCTION: at most nBuckets keys ever exist
    * (each two longs), so no TTL/eviction is needed — the one streaming
    * operator here whose state cannot grow with the stream. */
  def streamingDriftBuckets(
      stream: Dataset[(Long, Boolean)]): Dataset[(Long, Long, Long)] = {
    implicit val stateEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    stream
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Long)](GroupStateTimeout.NoTimeout) {
        (bucket: Long, rows: Iterator[(Long, Boolean)], state: GroupState[(Long, Long)]) =>
          var (na, nb) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { case (_, isA) => if (isA) na += 1L else nb += 1L }
          state.update((na, nb))
          (bucket, na, nb)
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

  /** Ingest-time twin of the q183 quality-filter funnel
    * ([[graft.ops.Text.filterFunnel]]) — the COMPOSITION gate of the
    * streaming family (decontamination, anomalies, drift, routing and
    * quality-scoring each have batch-equal twins; this composes the
    * funnel they feed): per micro-batch, driven from `foreachBatch`, the
    * three rule flags are the audited batch projections applied VERBATIM
    * to the batch frame through [[graft.ops.Text.funnelRuleFlags]] —
    * stateless per-row work plus the uniform-doc_id flag joins, all
    * batch-bounded — and the dedup stage maintains a DISTRIBUTED running
    * canonical table (content hash → min doc_id seen). Nothing is
    * driver-held; in production the two running frames are
    * storage-backed ingest tables with merge-on-write, and the lazy
    * union of per-batch checkpoints here is the in-memory stand-in.
    *
    * Cost contract (round 16, advisor): per-batch work is AMORTIZED
    * BATCH-BOUNDED via TIERED segment compaction — the LSM/binary-counter
    * scheme. Each ingested batch eagerly localCheckpoints only its own
    * flag frame and its (h, min cid) pre-aggregate as a LEVEL-0 segment;
    * whenever two segments share a level they merge into one segment a
    * level up (one checkpoint over ~2^level batches; the canonical
    * segments additionally collapse through groupBy(h).min(cid), so they
    * stay vocab-of-hashes-bounded at every level). A row is therefore
    * re-checkpointed at most once per level — O(N log N) TOTAL ingest
    * work instead of the O(N²/64) tail the earlier fixed-cadence
    * compaction had (it re-checkpointed the FULL history every 64
    * batches) — and at most O(log batches) segments are ever live, so
    * the report-time union plan is logarithmic too. Individual batches
    * at a 2^k boundary pay that merge; the 8-batch bench anchor's
    * flatness gate reads the amortized shape, and the >boundary spec in
    * ScaleOpsSpec exercises the multi-level merges directly.
    *
    * [[report]] at any point equals the batch funnel over everything
    * ingested so far — INCLUDING retroactive canonical displacement (a
    * later batch delivering a smaller doc_id for a seen hash flips the
    * earlier arrival's u_keep), which is why u_keep joins against the
    * CURRENT canonical table at report time instead of freezing at
    * ingest time. Asserted equal to the batch funnel on a two-batch
    * replay with displacement in ScaleOpsSpec. */
  final class StreamingFunnel {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{col, md5, min => fmin}
    // checkpointed segments as (level, frame), newest first; a level-k
    // segment holds ~2^k batches of rows (flags) or their collapsed
    // (h, min cid) table (canon). Only equal-level segments ever merge.
    @volatile private var flagSegs: List[(Int, DataFrame)] = Nil
    @volatile private var canonSegs: List[(Int, DataFrame)] = Nil

    /** Binary-counter push: append a level-0 segment, then merge while
      * the two newest segments share a level. `collapse` re-aggregates a
      * merged canon segment so it stays vocab-bounded; flags pass
      * through unchanged. */
    private def push(segs: List[(Int, DataFrame)], frame: DataFrame,
                     collapse: DataFrame => DataFrame): List[(Int, DataFrame)] = {
      var out = (0, frame) :: segs
      while (out.lengthCompare(2) >= 0 && out.head._1 == out(1)._1) {
        val merged = collapse(out(1)._2.unionByName(out.head._2))
          .localCheckpoint(true)
        // free the two consumed segments NOW (round 17, advisor): their
        // checkpoint blocks otherwise linger until the ContextCleaner
        // GCs the frames, so a 2^k merge boundary transiently held ~2x
        // that span's storage; the merged checkpoint has materialized,
        // so nothing reads them again
        unpersistSegment(out.head._2); unpersistSegment(out(1)._2)
        out = (out.head._1 + 1, merged) :: out.drop(2)
      }
      out
    }

    /** Drop a superseded segment's local-checkpoint storage. A
      * localCheckpointed frame is a LogicalRDD over the persisted
      * internal RDD — unpersist that RDD directly (blocking = false; a
      * failure degrades to the old GC-driven freeing). */
    private def unpersistSegment(df: DataFrame): Unit = try {
      df.queryExecution.analyzed.collectLeaves().foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    } catch { case e if scala.util.control.NonFatal(e) => () }

    /** Ingest one micro-batch of (doc_id, source, text) rows. Amortized
      * cost is batch-bounded: the new frames materialize as level-0
      * segments, and tiered merges re-checkpoint a row at most once per
      * level (O(log batches) over the stream's life). */
    def ingestBatch(batch: DataFrame): Unit = synchronized {
      val base = batch.select(col("doc_id"), col("source"), col("text"))
        .localCheckpoint(true)
      val bFlags = graft.ops.Text.funnelRuleFlags(base).localCheckpoint(true)
      flagSegs = push(flagSegs, bFlags, identity)
      val bCanon = base.select(md5(col("text")).as("h"), col("doc_id").as("cid"))
        .groupBy(col("h")).agg(fmin(col("cid")).as("cid"))
        .localCheckpoint(true)
      canonSegs = push(canonSegs, bCanon,
        _.groupBy(col("h")).agg(fmin(col("cid")).as("cid")))
    }

    /** Live (flags, canon) segment counts — the test hook for the
      * binary-counter invariant (= popcount of the batch count). */
    private[graft] def segmentCounts: (Int, Int) =
      (flagSegs.size, canonSegs.size)

    /** The funnel survival report over everything ingested so far —
      * batch-funnel-equal by construction (same flag projections, same
      * rollup, current-canonical u_keep; min is associative, so the
      * groupBy over the O(log batches) canon segments is the canonical
      * table).
      *
      * The returned frame is EAGERLY materialized (round 18, advisor):
      * [[push]] unpersists consumed segments at every 2^k merge boundary,
      * so a LAZY report plan held across a later [[ingestBatch]] would
      * reference checkpoint blocks that no longer exist and fail on its
      * first action. The rollup is a per-source handful of rows, so
      * checkpointing it here costs one small job and makes every report
      * handle self-contained for the rest of the session. */
    def report(): DataFrame = synchronized {
      if (flagSegs.isEmpty)
        throw new IllegalStateException("StreamingFunnel: no batches ingested")
      val f = flagSegs.map(_._2).reduce(_ unionByName _)
      val canon = canonSegs.map(_._2).reduce(_ unionByName _)
        .groupBy(col("h")).agg(fmin(col("cid")).as("cid"))
      graft.ops.Text.funnelRollup(f.join(canon, "h")
        .withColumn("u_keep", (col("doc_id") === col("cid"))
          .cast(org.apache.spark.sql.types.LongType)))
        .localCheckpoint(true)
    }
  }
}
