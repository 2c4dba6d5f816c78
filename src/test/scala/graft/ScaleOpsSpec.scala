package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.sources.Bucketed
import graft.streaming.StatefulOps

/** Scale-path operators: salted skew handling, bucketed co-located joins,
  * stateful streaming dedup. */
class ScaleOpsSpec extends SparkSpec {

  test("salted aggregation equals plain aggregation") {
    val salted = Skew.qSaltedAgg(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val plain = graft.core.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)), sum(col("value").cast("decimal(18,2)")).cast("double"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(salted == plain)
  }

  test("salted join equals plain join aggregation") {
    val salted = Skew.qSaltedJoin(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val plain = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("bucketed join plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = graft.core.Tables.orders(spark, sfDir)
      val customer = graft.core.Tables.customer(spark, sfDir)
        .withColumnRenamed("c_custkey", "o_custkey")
      Bucketed.writeBucketed(orders, "b_orders", "o_custkey", 8)
      Bucketed.writeBucketed(customer, "b_customer", "o_custkey", 8)
      val joined = Bucketed.bucketedJoin(spark, "b_orders", "b_customer", "o_custkey")
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // guard against a vacuous assertion: the stripped plan must contain
      // the join itself
      assert(plan.collect { case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }.nonEmpty,
        s"expected a sort-merge join over bucketed tables, got:\n$plan")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("streamingDedup emits each (key, token) once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val out = StatefulOps.streamingDedup(mem.toDS())
    val q = out.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    mem.addData(("a", 1L), ("a", 2L), ("b", 1L), ("a", 1L))
    q.processAllAvailable()
    mem.addData(("a", 2L), ("a", 3L), ("b", 1L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_test").as[(String, Long)].collect().toSeq
    assert(rows.sorted == Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 1L)))
  }

  test("streamingDedup: the maxTokens state cap is live, evicting oldest-first-seen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val out = StatefulOps.streamingDedup(mem.toDS(), maxTokens = 3)
    val q = out.writeStream.format("memory").queryName("dedup_cap_test")
      .outputMode("append").start()
    mem.addData(("a", 1L), ("a", 2L), ("a", 3L))
    q.processAllAvailable()
    mem.addData(("a", 4L))              // cap 3: evicts oldest-seen token 1
    q.processAllAvailable()
    mem.addData(("a", 1L), ("a", 4L))   // 1 was evicted -> re-emitted; 4 retained -> suppressed
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_cap_test").as[(String, Long)].collect().toSeq.sorted
    // the documented error direction: one duplicate passes (the evicted
    // 1L re-emits), nothing genuinely new is ever dropped
    assert(rows == Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L)),
      s"FIFO cap semantics violated: $rows")
  }

  test("streamingDedup state survives a query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[(String, Long)]
    // memory sink cannot recover from a checkpoint; foreachBatch can
    val emitted = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long)]()
    def startQuery() = StatefulOps.streamingDedup(mem.toDS())
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
        batch.collect().foreach(emitted.add)
      }
      .start()
    val q1 = startQuery()
    mem.addData(("a", 1L), ("a", 2L))
    q1.processAllAvailable()
    q1.stop()
    // new query instance, same checkpoint: per-key seen-set must recover
    val q2 = startQuery()
    mem.addData(("a", 1L), ("a", 3L))   // 1 already seen BEFORE the restart
    q2.processAllAvailable()
    q2.stop()
    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSeq.sorted == Seq(("a", 1L), ("a", 2L), ("a", 3L)),
      s"state not recovered across restart: ${emitted.asScala.toSeq.sorted}")
  }

  test("runningCounts accumulates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val out = StatefulOps.runningCounts(mem.toDS())
    val q = out.writeStream.format("memory").queryName("rc_test")
      .outputMode("update").start()
    mem.addData(("x", 2L), ("x", 3L))
    q.processAllAvailable()
    mem.addData(("x", 5L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rc_test").as[(String, Long)].collect().toSeq
    assert(rows.contains(("x", 10L)))
  }

  test("streamingAnomalies: ingest-time flags converge to the batch operator's set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // replay the real events corpus through the stateful stream in two
    // batches; the LAST emission per user must equal the batch flags
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_millis(ts) div 3600000").as("hr"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ev.nonEmpty)
    val (b1, b2) = ev.splitAt(ev.length / 2)
    val mem = MemoryStream[(Long, Long)]
    // Append mode cannot retract: each batch re-emits the flags of every
    // user it touches, evaluated over the user's FULL state so far. The
    // converged answer is therefore each user's emission in the LAST
    // batch that touched them — tag emissions with their batch id and
    // compare per user.
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, (Long, Long, Long))]
    val q = StatefulOps.streamingAnomalies(mem.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, Long, Long)], bid: Long) =>
        val rows = batch.collect()
        emitted.synchronized { emitted ++= rows.map(bid -> _) }
        ()
      }.start()
    mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    val phase1End = emitted.synchronized(emitted.length)
    mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    // Authoritative phase per user = the last addData window that touched
    // them; WITHIN a phase keep only the user's emissions from their
    // highest observed batch id. Absolute batch ids are never assumed
    // (an engine-scheduled extra or empty micro-batch shifts them): an
    // empty batch emits nothing, and any later batch touching a user
    // re-emits that user's full current flag set, so max-bid-within-phase
    // is the converged emission — and a phase with no emissions for a
    // touched user means "no flags", the latest-emission-wins contract.
    val (phase1, phase2) = emitted.synchronized(emitted.toVector).splitAt(phase1End)
    val usersIn2 = b2.map(_._1).toSet
    def lastEmission(rows: Vector[(Long, (Long, Long, Long))]): Set[(Long, Long, Long)] =
      rows.groupBy(_._2._1).values.flatMap { rs =>
        val maxBid = rs.map(_._1).max
        rs.collect { case (bid, r) if bid == maxBid => r }
      }.toSet
    val converged =
      lastEmission(phase2.filter { case (_, (u, _, _)) => usersIn2(u) }) ++
        lastEmission(phase1.filter { case (_, (u, _, _)) => !usersIn2(u) })
    val batchFlags = graft.ops.Events.qAnomalies(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(converged == batchFlags,
      s"stream flags diverge from batch: extra=${converged -- batchFlags} missing=${batchFlags -- converged}")
    assert(batchFlags.nonEmpty, "corpus should produce at least one flag")
  }

  test("StreamingFunnel: two-batch ingest reproduces the batch funnel, incl. canonical displacement") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.ops.Text.funnelGateCorpus(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(corpus.nonEmpty)
    // the re-keyed plants (huge doc_ids) go FIRST: they become canonical
    // for their hash in batch 1, then their originals (small doc_ids)
    // arrive in batch 2 and must DISPLACE them — the retroactive-u_keep
    // path a frozen-at-ingest flag would get wrong
    val (plants, originals) = corpus.partition(_._1 >= 4000000000L)
    assert(plants.nonEmpty && originals.nonEmpty)
    val (o1, o2) = originals.splitAt(originals.length / 2)
    val plantedInB2 = plants.map(t => t._1 / 4 - 1000000000L).toSet
      .intersect(o2.map(_._1).toSet)
    assert(plantedInB2.nonEmpty, "split must place some plant originals in batch 2")
    val b1 = plants ++ o1
    val mem = MemoryStream[(Long, String, String)]
    val funnel = new StatefulOps.StreamingFunnel
    val q = mem.toDS().toDF("doc_id", "source", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        funnel.ingestBatch(batch)
        ()
      }.start()
    mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    // mid-replay the report is already the exact batch funnel over
    // everything ingested so far
    val mid = funnel.report().collect().map(_.toString).sorted.toSeq
    val midWant = graft.ops.Text.filterFunnel(
        b1.toSeq.toDF("doc_id", "source", "text"))
      .collect().map(_.toString).sorted.toSeq
    assert(mid == midWant, s"mid-replay funnel diverges: $mid vs $midWant")
    mem.addData(o2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val got = funnel.report().collect().map(_.toString).sorted.toSeq
    val want = graft.ops.Text.qFilterFunnel(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want,
      s"converged funnel diverges from batch: $got vs $want")
  }

  test("StreamingFunnel: tiered compaction across 11 batches — binary-counter segments, batch-funnel-equal") {
    import spark.implicits._
    // drives ingestBatch directly (the two-batch test covers the stream
    // plumbing) across enough batches to exercise MULTI-LEVEL merges —
    // the round-15 advisor's gap: the fixed-cadence compactor's quadratic
    // tail was never observable at 8 bench batches. Segment counts must
    // track popcount(batches) exactly (the binary-counter invariant), so
    // re-checkpoint work is O(N log N) by construction, and the report
    // must stay funnel-equal THROUGH the merge boundaries (2, 4, 8).
    val corpus = graft.ops.Text.funnelGateCorpus(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val nBatches = 11
    val chunks = corpus.zipWithIndex.groupMap(_._2 % nBatches)(_._1)
    val funnel = new StatefulOps.StreamingFunnel
    var ingested = Seq.empty[(Long, String, String)]
    (0 until nBatches).foreach { i =>
      val chunk = chunks(i).toSeq
      funnel.ingestBatch(chunk.toDF("doc_id", "source", "text"))
      ingested = ingested ++ chunk
      val want = Integer.bitCount(i + 1)
      val (fs, cs) = funnel.segmentCounts
      assert(fs == want && cs == want,
        s"after ${i + 1} batches: segments ($fs, $cs), want popcount=$want")
      if (i + 1 == 4 || i + 1 == 8 || i + 1 == nBatches) {
        val got = funnel.report().collect().map(_.toString).sorted.toSeq
        val wantF = graft.ops.Text.filterFunnel(
            ingested.toDF("doc_id", "source", "text"))
          .collect().map(_.toString).sorted.toSeq
        assert(got == wantF, s"funnel diverges after ${i + 1} batches")
      }
    }
  }

  test("StreamingFunnel: a held report() handle survives later ingests past a merge boundary") {
    import spark.implicits._
    // round-18 advisor: push() eagerly unpersists consumed segments at 2^k
    // merge boundaries, so a LAZY report plan held across a later
    // ingestBatch referenced dropped checkpoint blocks and failed on its
    // first action. report() now materializes before returning — a handle
    // taken after batch 1 must still collect (to the batch-1 truth) after
    // batches 2-4 have merged batch 1's segments away.
    val corpus = graft.ops.Text.funnelGateCorpus(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val chunks = corpus.zipWithIndex.groupMap(_._2 % 4)(_._1)
    val funnel = new StatefulOps.StreamingFunnel
    funnel.ingestBatch(chunks(0).toSeq.toDF("doc_id", "source", "text"))
    val held = funnel.report()
    val heldWant = graft.ops.Text.filterFunnel(
        chunks(0).toSeq.toDF("doc_id", "source", "text"))
      .collect().map(_.toString).sorted.toSeq
    (1 until 4).foreach { i =>
      funnel.ingestBatch(chunks(i).toSeq.toDF("doc_id", "source", "text"))
    }
    // 4 batches -> one level-2 segment: every batch-1-era segment has been
    // consumed and unpersisted by now
    assert(funnel.segmentCounts == ((1, 1)))
    val heldGot = held.collect().map(_.toString).sorted.toSeq
    assert(heldGot == heldWant,
      s"held report handle no longer actionable/correct: $heldGot vs $heldWant")
  }

  test("streamingDriftBuckets: converged stream counts reproduce the batch PSI exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val rows = emb.select(graft.ops.Embeddings.driftBucketExpr(0, 20).as("bucket"),
        (col("vec_id") % 2 === 0).as("is_a"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(rows.nonEmpty)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, Boolean)]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, (Long, Long, Long))]
    val q = StatefulOps.streamingDriftBuckets(mem.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, Long, Long)], bid: Long) =>
        val rs = batch.collect()
        emitted.synchronized { emitted ++= rs.map(bid -> _) }
        ()
      }.start()
    mem.addData(b1.toIndexedSeq); q.processAllAvailable()
    mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    // running totals are monotone, so the converged count per bucket is
    // its emission with the highest observed batch id
    val fin = emitted.synchronized(emitted.toVector)
      .groupBy(_._2._1).map { case (_, rs) => rs.maxBy(_._1)._2 }.toSeq
    val streamPsi = graft.ops.Embeddings
      .psiFromCounts(spark, fin.toDF("bucket", "n_a", "n_b"), 20)
      .collect().map(_.toString).sorted.toSeq
    val batchPsi = graft.ops.Embeddings.driftPsi(emb)
      .collect().map(_.toString).sorted.toSeq
    assert(streamPsi == batchPsi)
    assert(fin.map(t => t._2 + t._3).sum == rows.length.toLong, "counts conserve")
  }

  test("streamingDriftBuckets state survives a query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // kill-and-restart mid-corpus: a new query on the same checkpoint
    // must recover every bucket's running totals from the state store,
    // so the converged counts (and thus the PSI) still equal the batch
    // operator's despite the restart.
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val rows = emb.select(graft.ops.Embeddings.driftBucketExpr(0, 20).as("bucket"),
        (col("vec_id") % 2 === 0).as("is_a"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_drift_ckpt").toString
    val mem = MemoryStream[(Long, Boolean)]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, (Long, Long, Long))]
    def startQuery() = StatefulOps.streamingDriftBuckets(mem.toDS())
      .writeStream.option("checkpointLocation", ckpt).outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, Long, Long)], bid: Long) =>
        val rs = batch.collect()
        emitted.synchronized { emitted ++= rs.map(bid -> _) }
        ()
      }.start()
    val q1 = startQuery()
    mem.addData(b1.toIndexedSeq); q1.processAllAvailable(); q1.stop()
    val q2 = startQuery()
    mem.addData(b2.toIndexedSeq); q2.processAllAvailable(); q2.stop()
    val fin = emitted.synchronized(emitted.toVector)
      .groupBy(_._2._1).map { case (_, rs) => rs.maxBy(_._1)._2 }.toSeq
    val streamPsi = graft.ops.Embeddings
      .psiFromCounts(spark, fin.toDF("bucket", "n_a", "n_b"), 20)
      .collect().map(_.toString).sorted.toSeq
    val batchPsi = graft.ops.Embeddings.driftPsi(emb)
      .collect().map(_.toString).sorted.toSeq
    assert(streamPsi == batchPsi, "restart lost bucket state")
  }

  test("streamingAnomalies state survives a query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // KILL-AND-RESTART mid-corpus (round-10 verdict: the convergence test
    // above only proves two-batch convergence in ONE query instance): a
    // new query on the same checkpoint must recover every user's hourly
    // history from the state store, so post-restart flags are computed
    // over pre-restart hours and the converged set still equals the batch
    // operator's.
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_millis(ts) div 3600000").as("hr"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (b1, b2) = ev.splitAt(ev.length / 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_anom_ckpt").toString
    val mem = MemoryStream[(Long, Long)]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, (Long, Long, Long))]
    def startQuery() = StatefulOps.streamingAnomalies(mem.toDS())
      .writeStream.option("checkpointLocation", ckpt).outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, Long, Long)], bid: Long) =>
        val rows = batch.collect()
        emitted.synchronized { emitted ++= rows.map(bid -> _) }
        ()
      }.start()
    val q1 = startQuery()
    mem.addData(b1.toIndexedSeq); q1.processAllAvailable(); q1.stop()
    val phase1End = emitted.synchronized(emitted.length)
    val q2 = startQuery()
    mem.addData(b2.toIndexedSeq); q2.processAllAvailable(); q2.stop()
    // same latest-emission-wins reading as the convergence test
    val (phase1, phase2) = emitted.synchronized(emitted.toVector).splitAt(phase1End)
    val usersIn2 = b2.map(_._1).toSet
    def lastEmission(rows: Vector[(Long, (Long, Long, Long))]): Set[(Long, Long, Long)] =
      rows.groupBy(_._2._1).values.flatMap { rs =>
        val maxBid = rs.map(_._1).max
        rs.collect { case (bid, r) if bid == maxBid => r }
      }.toSet
    val converged =
      lastEmission(phase2.filter { case (_, (u, _, _)) => usersIn2(u) }) ++
        lastEmission(phase1.filter { case (_, (u, _, _)) => !usersIn2(u) })
    val batchFlags = graft.ops.Events.qAnomalies(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(converged == batchFlags,
      s"restart lost state: extra=${converged -- batchFlags} missing=${batchFlags -- converged}")
    assert(batchFlags.nonEmpty, "corpus should produce at least one flag")
  }

  test("streamingAnomalies bounds per-user state at the newest maxHours buckets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // One user: ten quiet hours (0..9, count 1 each) then a 100-event
    // spike at hour 10. Over the FULL history H=11 the spike clears 3σ
    // (z ≈ √10 > 3, asserted via the batch twin); under maxHours=3 the
    // retained window {8,9,10} has H=3, where a single spike can never
    // clear 3σ (max z = √(H−1) = √2). The two answers DIVERGE exactly
    // when eviction bites — so "windowed stream silent, full-history
    // twin flags" proves the state bound is live, not a no-op.
    val quiet = (0L to 9L).map(h => (77L, h))
    val spike = Seq.fill(100)((77L, 10L))
    val mem = MemoryStream[(Long, Long)]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = StatefulOps.streamingAnomalies(mem.toDS(), maxHours = 3)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, Long, Long)], _: Long) =>
        val rows = batch.collect(); emitted.synchronized { emitted ++= rows }; ()
      }.start()
    mem.addData(quiet.toIndexedSeq); q.processAllAvailable()
    val afterQuiet = emitted.synchronized(emitted.length)
    mem.addData(spike.toIndexedSeq); q.processAllAvailable()
    q.stop()
    // windowed state {8,9,10} → H=3: a single spike cannot clear 3σ at
    // H=3 (max z = √(H−1) = √2 < 3), so the final phase emits NOTHING —
    // while the unbounded operator over the same replay WOULD flag hour
    // 10 (H=11, z ≈ √10 > 3, verified by the batch twin below)
    val windowedFlags = emitted.synchronized(emitted.drop(afterQuiet).toVector)
    assert(windowedFlags.isEmpty,
      s"3-hour window flagged despite √(H−1) bound: $windowedFlags")
    val fullHistory = (quiet ++ spike).toDF("user_id", "hr")
      .select(col("user_id"), timestamp_millis(col("hr") * 3600000L).as("ts"))
    val batchFlags = graft.ops.Events.hourlyAnomalies(
        fullHistory.select(col("user_id"), col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batchFlags == Set((77L, 10L, 100L)),
      s"full-history twin should flag the spike: $batchFlags")
  }

  test("range-partitioned export: global order with NO single-reducer sort") {
    // the canonical way to materialize a globally-ordered corpus at 100 TB:
    // repartitionByRange samples split points, every partition sorts
    // LOCALLY, and global order falls out of partition boundaries — a
    // global Sort (one reducer owning the world) never appears
    val orders = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val exported = orders
      .repartitionByRange(6, col("o_totalprice"), col("o_orderkey"))
      .sortWithinPartitions(col("o_totalprice"), col("o_orderkey"))
    val plan = exported.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"export lost its range exchange:\n$plan")
    // every Sort node must be local (global=false renders as ', false,')
    assert(!plan.contains("Sort [") || !plan.matches("(?s).*Sort \\[[^\\]]*\\], true,.*"),
      s"export planned a GLOBAL sort:\n$plan")
    // partitions are internally sorted and their ranges are disjoint+ordered
    val parts = exported.rdd.mapPartitionsWithIndex { (i, it) =>
      val vs = it.map(r => (r.getDouble(1), r.getLong(0))).toArray
      if (vs.isEmpty) Iterator.empty
      else Iterator((i, vs.head, vs.last, vs.zip(vs.tail).forall { case (a, b) => a._1 <= b._1 }))
    }.collect().sortBy(_._1)
    assert(parts.nonEmpty && parts.forall(_._4), "a partition is not locally sorted")
    for (Array(a, b) <- parts.sliding(2).map(_.toArray) if b != null && a != null)
      assert(a._3._1 <= b._2._1,
        s"partition ${a._1} max ${a._3} overlaps partition ${b._1} min ${b._2}")
  }
}
