package graft

import org.apache.spark.sql.functions._
import graft.ops.{Embeddings, Events, Relational}

/** Unit-level invariants; full value-parity against DuckDB is the driver's
  * oracle gate (tools/check_oracle.py runs the same check locally). */
class RelationalSpec extends SparkSpec {

  test("q01 aggregates partition-independently (exact decimal sums)") {
    val a = Relational.q01Agg(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    // rerun with different shuffle partitioning — values must be identical
    spark.conf.set("spark.sql.shuffle.partitions", "11")
    val b = Relational.q01Agg(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert(a == b)
  }

  test("semi + anti join partition customer exactly") {
    val semi = Relational.q06SemiJoin(spark, sfDir).agg(sum("n_cust")).collect().head.getLong(0)
    val anti = Relational.q07AntiJoin(spark, sfDir)
      .agg(coalesce(sum("n_cust"), lit(0L))).collect().head.getLong(0)
    val total = graft.core.Tables.customer(spark, sfDir).count()
    assert(semi + anti == total)
  }

  test("top-k is ordered and bounded") {
    val rows = Relational.q03TopK(spark, sfDir).collect()
    assert(rows.length == 20)
    val prices = rows.map(_.getDouble(2))
    assert(prices.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("sessionize: session count bounded by event count") {
    val rows = Events.qSessionize(spark, sfDir).collect()
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(2)))
  }

  test("knn returns k ordered neighbors per query") {
    val rows = Embeddings.qKnn(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      val sims = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.sliding(2).forall { case Array(a, b) => a >= b })
    }
  }

  test("SQL surface: registered views + native functions from spark.sql") {
    graft.core.Views.register(spark, sfDir)
    val n = spark.sql("SELECT count(*) AS n FROM lineitem").collect().head.getLong(0)
    assert(n == graft.core.Tables.lineitem(spark, sfDir).count())
    // native function via pure SQL over a view
    val sims = spark.sql(
      """SELECT a.vec_id, graft_dot(a.embedding, a.embedding) AS n2
         FROM embeddings a WHERE a.vec_id < 3""").collect()
    assert(sims.length == 3 && sims.forall(_.getDouble(1) > 0.0))
    // events view carries the normalized timestamp
    val ts = spark.sql("SELECT min(ts) FROM events").collect().head
    assert(!ts.isNullAt(0))
  }

  test("approximate sketches track exact values within tolerance") {
    val r = Relational.q67ApproxSketches(spark, sfDir).collect().head
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"HLL distinct $approx too far from exact $exact")
    // p50/p99 must be ordered and within the observed value range
    val p50 = r.getDouble(2); val p99 = r.getDouble(3)
    assert(p50 <= p99)
    val stats = graft.core.Tables.lineitem(spark, sfDir)
      .agg(min("l_extendedprice"), max("l_extendedprice")).collect().head
    assert(p50 >= stats.getDouble(0) && p99 <= stats.getDouble(1))
  }

  test("ann recall: LSH top-1 appears in brute-force top-5 for most queries") {
    val bf = Embeddings.qKnn(spark, sfDir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val ann = Embeddings.qAnnKnn(spark, sfDir).collect()
      .filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // LSH with 8 planes on near-uniform vectors: expect some overlap, not
    // perfection — require at least one hit to catch wiring regressions
    val hits = ann.count { case (q, n) => bf.getOrElse(q, Set.empty).contains(n) }
    assert(ann.nonEmpty)
    assert(hits >= 1 || ann.isEmpty)
  }

  test("rangeJoin: equals the naive inequality join, never a nested-loop plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // overlapping intervals incl. negative values and bucket-boundary
    // endpoints; points at boundaries (lo inclusive, hi exclusive)
    val pts = Seq(-150.0, -100.0, 0.0, 99.9, 100.0, 250.0, 999.9, 1000.0, 2500.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "v")
    val iv = Seq(
      (1L, -200.0, 0.0), (2L, -100.0, 150.0), (3L, 100.0, 100.0), // empty [100,100)
      (4L, 0.0, 1000.0), (5L, 900.0, 2600.0)).toDF("iid", "lo", "hi")
    val joined = graft.ops.Relational.rangeJoin(
      pts, col("v"), iv, col("lo"), col("hi"), bucketWidth = 300.0)
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.join(iv, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(naive.contains((0L, 1L)) && naive.contains((4L, 2L))) // spot-check shape
    // the scale contract: a bucket equi-join, not BroadcastNestedLoopJoin
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join planned as a nested loop:\n$plan")
    // ...while the naive formulation IS the nested loop we refuse to ship
    assert(pts.join(iv, col("v") >= col("lo") && col("v") < col("hi"))
      .queryExecution.executedPlan.toString.contains("BroadcastNestedLoop"))
  }

  test("rangeJoin: colliding internal column or shared PREDICATE columns fail loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pts = Seq((1L, 5.0)).toDF("pid", "v")
    val iv = Seq((9L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    // internal bucket column collision (would be silently overwritten+dropped)
    intercept[IllegalArgumentException] {
      graft.ops.Relational.rangeJoin(pts.withColumn("__graft_bkt", lit(1)),
        col("v"), iv, col("lo"), col("hi"), bucketWidth = 10.0)
    }
    // a shared name REFERENCED by a predicate is ambiguous at resolution
    intercept[IllegalArgumentException] {
      graft.ops.Relational.rangeJoin(pts, col("v"),
        iv.withColumnRenamed("iid", "v"), col("lo"), col("hi"), bucketWidth = 10.0)
    }
    // a shared passthrough name the predicates never touch is ALLOWED — it
    // resolves fine and merely appears twice in the output
    val shared = graft.ops.Relational.rangeJoin(pts, col("v"),
      iv.withColumnRenamed("iid", "pid"), col("lo"), col("hi"), bucketWidth = 10.0)
    assert(shared.count() == 1)
    assert(shared.columns.count(_ == "pid") == 2)
  }

  test("rangeJoin: random intervals and points equal the naive join (property)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val pts = (0 until 200).map(i => (i.toLong, rng.nextDouble() * 200 - 100))
        .toDF("pid", "v")
      val iv = (0 until 30).map { i =>
        val lo = rng.nextDouble() * 200 - 100
        (i.toLong, lo, lo + rng.nextDouble() * 40)
      }.toDF("iid", "lo", "hi")
      val w = Seq(0.5, 3.0, 50.0)(trial)
      val got = graft.ops.Relational.rangeJoin(
        pts, col("v"), iv, col("lo"), col("hi"), bucketWidth = w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = pts.join(iv, col("v") >= col("lo") && col("v") < col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"trial $trial (bucketWidth=$w): ${got.size} vs ${naive.size}")
      assert(naive.nonEmpty) // the config must actually exercise matches
    }
  }

  test("pivot: one aggregation pass, missing combinations surface as NULL") {
    import spark.implicits._
    // pinned value lists keep pivot to its two hash-agg tiers (cell sums,
    // then pivotfirst) — partial+final around each exchange, nothing
    // funnels to one partition, and no distinct-values pre-scan job runs
    val p = graft.ops.Relational.q90Pivot(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("pivotfirst"), s"pivot lost its pivotfirst tier:\n$p")
    assert("HashAggregate".r.findAllIn(p).length == 4, s"pivot grew extra agg passes:\n$p")
    assert("Exchange".r.findAllIn(p).length <= 2 && !p.contains("SinglePartition"),
      s"pivot grew extra shuffles:\n$p")
    // null semantics: a (flag, status) combination absent from the input
    // must yield a NULL cell, not 0
    val tiny = Seq(("A", "F", 1.0), ("A", "F", 2.0), ("N", "O", 5.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val rows = tiny.groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity")))
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(rows == Set(("A", Some(3.0), None), ("N", None, Some(5.0))), s"got $rows")
  }

  test("grouping sets: tiers reaggregate one base, no Expand of the fact") {
    val df = Relational.q91GroupingSets(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // round 19: the literal GROUPING SETS form Expanded the fact table ×4;
    // the reaggregation form derives the coarser tiers from the cached
    // (flag, status) base aggregate — the plan must carry NO Expand and at
    // most the base's single lineitem scan, never four scans unioned
    assert(!p.contains("Expand"), s"grouping sets re-grew an Expand:\n$p")
    // every tier must read the CACHED base aggregate (InMemoryTableScan),
    // never re-scan lineitem per branch; the string render repeats the
    // cached relation's child plan per branch, so count cache reads, not
    // "FileScan" occurrences
    assert("InMemoryTableScan".r.findAllIn(p).length >= 4,
      s"grouping-sets tiers no longer read the cached base aggregate:\n$p")
    val rows = df.collect()
    def tier(gf: Int, gs: Int) = rows.filter(r => r.getInt(2) == gf && r.getInt(3) == gs)
    val grand = tier(1, 1)
    assert(grand.length == 1, s"expected one () row, got ${grand.length}")
    val total = grand.head.getLong(4)
    // every coarser tier must re-aggregate to exactly the detail tier's count
    assert(tier(0, 0).map(_.getLong(4)).sum == total)
    assert(tier(0, 1).map(_.getLong(4)).sum == total)
    assert(tier(1, 0).map(_.getLong(4)).sum == total)
  }

  test("correlated scalar subquery decorrelates to an aggregate+join (q20 twin)") {
    val df = Relational.q92CorrelatedSql(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // Catalyst must rewrite the per-row subquery into aggregate+join: no
    // subquery node may survive to the physical plan (a per-row re-execution
    // would render as scalar-subquery)
    assert(!p.contains("scalar-subquery"), s"correlated subquery not decorrelated:\n$p")
    assert(p.contains("Join") || p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"decorrelation produced no join:\n$p")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val twin = Relational.q20AboveAvg(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == twin, s"SQL form diverged from the hand-decorrelated twin: $got vs $twin")
  }

  test("exact percentiles: known tiny inputs interpolate at p*(n-1), gate invariants hold") {
    import spark.implicits._
    // odd count: median is the middle element, exactly
    val odd = Seq(1.0, 3.0, 2.0).toDF("v")
      .agg(expr("percentile(v, 0.5D)")).head.getDouble(0)
    assert(odd == 2.0)
    // even count: linear interpolation midway between the middle pair
    val even = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
      .agg(expr("percentile(v, 0.5D)")).head.getDouble(0)
    assert(even == 2.5)
    val rows = Relational.q96Percentiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // columns: l_returnflag, n, med_qty, p95_qty, med_disc
    for (r <- rows)
      assert(r.getDouble(2) <= r.getDouble(3), s"p95_qty below med_qty in $r")
  }

  test("cohorts and funnel match a driver recomputation from raw events") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("unix_millis(ts)").as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(ev.nonEmpty)
    // cohorts twin
    val wk = ev.map { case (u, _, ms) => (u, ms / 1000L / 604800L) }
    val firstWk = wk.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val wantCoh = wk.map { case (u, w) => ((firstWk(u), w - firstWk(u)), u) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).distinct.size.toLong }
    val gotCoh = graft.ops.Events.qCohorts(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(gotCoh == wantCoh, s"cohorts diverged: $gotCoh vs $wantCoh")
    // funnel twin
    def minOf(u: Long, t: String): Option[Long] = {
      val xs = ev.collect { case (`u`, `t`, ms) => ms }
      if (xs.isEmpty) None else Some(xs.min)
    }
    val users = ev.map(_._1).distinct
    val nView = users.count(minOf(_, "view").isDefined)
    val nVC = users.count(u => (minOf(u, "view"), minOf(u, "click")) match {
      case (Some(v), Some(c)) => v < c; case _ => false
    })
    val nFull = users.count(u =>
      (minOf(u, "view"), minOf(u, "click"), minOf(u, "purchase")) match {
        case (Some(v), Some(c), Some(p)) => v < c && c < p; case _ => false
      })
    val f = graft.ops.Events.qFunnel(spark, sfDir).head
    assert((f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3)) ==
      (users.length.toLong, nView.toLong, nVC.toLong, nFull.toLong),
      s"funnel diverged: $f")
  }

  test("rolling window: trailing-hour counts match a driver range scan") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), expr("unix_millis(ts)").as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val want = ev.map { case (u, eid, ms) =>
      (u, eid) -> byUser(u).count { case (_, _, m2) => m2 >= ms - 3600000L && m2 <= ms }.toLong
    }.toMap
    val got = graft.ops.Events.qRolling(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == want, "rolling counts diverged from the driver range scan")
    assert(got.valuesIterator.max >= 2, "fixture should produce at least one overlap")
  }

  test("hourly anomalies: planted spike flagged, uniform users never flagged") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(hour: Long, k: Int): Timestamp = new Timestamp(hour * 3600000L + k * 1000L)
    // user 1: 15 quiet hours of 1 event + one hour with 20. A single
    // spike among H hours has z = sqrt(H-1) REGARDLESS of its size, so
    // H=10 sits exactly on the 3-sigma boundary (strict > -> not
    // flagged) and H=16 gives z = sqrt(15) > 3 -> flagged.
    // user 2: perfectly uniform (2 events every hour) -> sigma = 0, no flags
    val rows =
      (0 until 15).map(h => (1L, ts(h.toLong, 0))) ++
        (0 until 20).map(k => (1L, ts(15L, k))) ++
        (0 until 10).flatMap(h => Seq((2L, ts(h.toLong, 0)), (2L, ts(h.toLong, 1))))
    val ev = rows.toDF("user_id", "ts")
    val got = graft.ops.Events.hourlyAnomalies(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 15L, 20L)), s"got ${got.toSeq}")
    // the boundary itself: 9 quiet hours + any single spike is EXACTLY
    // 3 sigma ((cH-S)^2 == 9(H*SS-S^2) algebraically) -> never flagged
    val boundary = ((0 until 9).map(h => (3L, ts(h.toLong, 0))) ++
      (0 until 50).map(k => (3L, ts(9L, k)))).toDF("user_id", "ts")
    assert(graft.ops.Events.hourlyAnomalies(boundary).count() == 0L,
      "the sqrt(H-1) single-spike bound must not be flagged at H=10")
    // driver twin of the cleared-form test on the real corpus
    val real = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_millis(ts) div 3600000").as("hr"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hourly = real.groupBy(identity).map { case ((u, hr), xs) => (u, hr, xs.length.toLong) }
    val want = hourly.groupBy(_._1).flatMap { case (u, xs) =>
      val h = xs.size.toLong; val s = xs.map(_._3).sum
      val ss = xs.map(c => c._3 * c._3).sum
      xs.filter { case (_, _, c) =>
        c * h > s && (c * h - s) * (c * h - s) > 9L * (h * ss - s * s) }
    }.toSet
    val gotReal = graft.ops.Events.qAnomalies(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotReal == want, "anomaly flags diverged from the driver twin")
  }

  test("snapshot diff: planted add/remove/retain counts are exact") {
    import spark.implicits._
    val oldS = Seq((0L, "alpha", "s1"), (1L, "beta", "s1"), (2L, "gamma", "s2"))
      .toDF("doc_id", "text", "source")
    val newS = Seq((3L, "alpha", "s1"), (4L, "delta", "s1"), (5L, "gamma", "s2"),
      (6L, "epsilon", "s3")).toDF("doc_id", "text", "source")
    val got = graft.ops.Text.snapshotDiff(oldS, newS)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // s1: beta removed, delta added, alpha retained (id change irrelevant)
    assert(got == Map(
      "s1" -> ((1L, 1L, 1L)),
      "s2" -> ((0L, 0L, 1L)),
      "s3" -> ((1L, 0L, 0L))), s"got $got")
  }

  test("intervalOverlap: planted sessions meet windows with exact overlaps, across days") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    val day = 86400000L
    val rows = Seq(
      // type w, day 0: users 10/11 pin the window to [1000, 101000];
      // user 1's two events 10 s apart form ONE session [50000, 60000]
      // fully inside it → overlap exactly 10 000 ms
      (1000L, ts(1000L), 10L, "w"),
      (1001L, ts(101000L), 11L, "w"),
      (1L, ts(50000L), 1L, "w"),
      (2L, ts(60000L), 1L, "w"),
      // type x: user 3's events straddle midnight 20 min apart (< the
      // 30 min gap) → ONE session spanning days 0 and 1, which must meet
      // BOTH single-point daily windows via the day explode
      (3L, ts(day - 600000L), 3L, "x"),
      (4L, ts(day + 600000L), 3L, "x"),
      // type y, day 2 (clear of every other user's sessions — the join
      // is deliberately type-agnostic, so co-day sessions WOULD meet
      // this window): user 5's events sit 1 h apart (> gap) → TWO
      // sessions, each touching the (y, day2) window at zero length
      (5L, ts(2 * day), 5L, "y"),
      (6L, ts(2 * day + 3600000L), 5L, "y")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.intervalOverlap(rows)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got((1L, "w")) == ((1L, 10000L, 10000L)), s"$got")
    assert(got((3L, "x")) == ((2L, 0L, 0L)), s"$got")
    assert(got((5L, "y")) == ((2L, 0L, 0L)), s"$got")
    // window-pinning users only graze their own window edges
    assert(got((10L, "w")) == ((1L, 0L, 0L)) && got((11L, "w")) == ((1L, 0L, 0L)),
      s"$got")
    // no cross-type phantom rows: sessions never meet windows they
    // don't overlap in time
    assert(got.size == 5, s"unexpected extra rows: $got")
  }

  test("intervalOverlap: pre-epoch timestamps bucket by FLOOR day, not truncation") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    // Truncating `div` would fold the pre-epoch z events into day 0,
    // widening the (z, day 0) window to [-5e7, 5e7] and fabricating a
    // 1000 ms overlap for user 10's post-epoch session; floor division
    // (the DuckDB `//` the oracle uses) keeps them on day −1.
    val rows = Seq(
      (1L, ts(-50000000L), 8L, "z"),  // day −1 under floor, day 0 under div
      (2L, ts(50000000L), 9L, "z"),   // day 0 either way
      (3L, ts(0L), 10L, "q"),
      (4L, ts(1000L), 10L, "q")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.intervalOverlap(rows)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(!got.contains((10L, "z")),
      s"pre-epoch z window truncated into day 0 — fabricated overlap: $got")
    assert(got((10L, "q")) == ((1L, 1000L, 1000L)), s"$got")
    assert(got((8L, "z")) == ((1L, 0L, 0L)) && got((9L, "z")) == ((1L, 0L, 0L)),
      s"$got")
  }
}
