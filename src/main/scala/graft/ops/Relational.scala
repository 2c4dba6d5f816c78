package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Relational operator surface (SURVEY.md §2.1-2.6): scans, projections,
  * filters, hash aggregation, broadcast/shuffle/semi/anti joins, sorts,
  * limits, windows, set ops, scalar/string/date/JSON functions.
  *
  * Every query is written DataFrame-first so Catalyst plans it (predicate
  * pushdown, column pruning, partial aggregation, AQE). Numeric outputs are
  * made engine-portable for the DuckDB oracle:
  *   - money sums run over exact decimals (order-independent), then cast to
  *     double once — bit-identical across engines regardless of partitioning;
  *   - counts stay BIGINT;
  *   - averages are exact-decimal-sum / count in double (single IEEE divide).
  *
  * Reference anchor: the hash-agg / sort / top-K / broadcast shapes mirror
  * G019HW1.java:183-201 (cell histogram + sortByKey) and
  * WordCountExample.java:66-140 (reduceByKey word count, avg length), but as
  * declarative plans instead of hand-built RDD DAGs.
  */
object Relational {

  /** Exact decimal view of a 2-dp money/ratio column (order-independent sum). */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact decimal sum of a 2-dp column, exported as double. */
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** Exact average: decimal sum / count, one IEEE double division. */
  private def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))

  // ---------------------------------------------------------------- queries

  /** A1: partial+final hash aggregation over the fact table. */
  def q01Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("n_rows"))

  /** P1/P2 + pushdown showcase (TPC-H Q6 shape): filter+project reach the scan. */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1994-01-01").cast(TimestampType) &&
              col("l_shipdate") <  lit("1995-01-01").cast(TimestampType) &&
              col("l_discount").between(0.02, 0.06) &&
              col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** O1/O2: global sort + limit → TakeOrderedAndProject (no full sort at scale). */
  def q03TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)

  /** J3: broadcast equi-join demonstration — the hint is this operator's
    * contract (caller asserts the dim fits executor memory, as the
    * reference's nearest-center broadcast does); the star/HAVING/above-avg
    * queries below leave strategy to the planner instead. */
  def q04JoinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_extendedprice")).as("brand_rev"),
           count(lit(1)).as("n_items"))

  /** Multi-way join up a star schema. nation/region are FIXED-size catalogs
    * (25/5 rows at any scale) — forced broadcast is always right; customer
    * grows with the data, so its join strategy is left to the planner/AQE
    * (still a broadcast at test SF, a shuffle join at 100 TB). */
  def q05StarJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(dsum(col("o_totalprice")).as("region_rev"),
           count(lit(1)).as("n_orders"))

  /** J4 analogue: left-semi join (membership) — customers that have orders. */
  def q06SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))

  /** Anti join — customers with no orders. */
  def q07AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))

  /** A7: distinct aggregation (exact). */
  def q08Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
           countDistinct(col("o_orderstatus"), col("o_orderpriority")).as("n_status_prio"))

  /** Window ranking: top-3 orders per customer (deterministic tiebreak). */
  def q09WindowRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .filter(col("o_custkey") < 200)  // keep the verified output bounded
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
  }

  /** Set ops: nations that have suppliers vs customers (intersect/except). */
  def q10SetOps(s: SparkSession, dir: String): DataFrame = {
    val supN = Tables.supplier(s, dir).select(col("s_nationkey").as("nk")).distinct()
    val cusN = Tables.customer(s, dir).select(col("c_nationkey").as("nk")).distinct()
    val both = supN.intersect(cusN).withColumn("which", lit("both"))
    val supOnly = supN.except(cusN).withColumn("which", lit("sup_only"))
    both.unionByName(supOnly).groupBy(col("which")).agg(count(lit(1)).as("n"), sum(col("nk")).cast(LongType).as("sum_nk"))
  }

  /** Conditional aggregation (pivot shape) — sum(when) per status. */
  def q11CaseWhen(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast(LongType).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast(LongType).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).cast(LongType).as("n_p"),
        dsum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0))).as("rev_f"))

  /** F2/F4 scalar math incl. floor-toward−∞ on negatives (SURVEY §7.4 risk 1). */
  def q12ScalarMath(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        floor((col("value") - 250.0) / 10.0).cast(IntegerType).as("bucket"),
        col("value"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_v"))

  /** F3 string functions: split/substring/upper/length/concat. */
  def q13StringFns(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        split(col("p_type"), " ").getItem(0).as("type_head"),
        upper(substring(col("p_brand"), 1, 7)).as("brand_up"),
        length(col("p_name")).as("name_len"))
      .groupBy(col("type_head"), col("brand_up"))
      .agg(count(lit(1)).as("n"), sum(col("name_len")).cast(LongType).as("sum_len"))

  /** Date functions: group orders by calendar month. */
  def q14DateFns(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("rev"))

  /** Rollup (grouping sets) over returnflag/linestatus. */
  def q15Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  /** HAVING: brands appearing on more than `threshold` lineitems. part
    * grows with the data — join strategy left to the planner/AQE. */
  def q16Having(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 2000)

  /** IN-list + BETWEEN predicates. */
  def q17InBetween(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_size").between(10, 20) &&
              col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("p_size")).cast(LongType).as("sum_size"))

  /** JSON extraction from the events props column. */
  def q18Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"),
              col("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k_val")).cast(LongType).as("sum_k"),
           max(col("k_val")).as("max_k"))

  /** Window running aggregate: cumulative revenue per customer over time. */
  def q19WindowCum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 100)
      .withColumn("cum_rev", sum(dec(col("o_totalprice"))).over(w).cast(DoubleType))
      .select(col("o_custkey"), col("o_orderkey"), col("cum_rev"))
  }

  /** Correlated-style scalar aggregate: orders above their customer's
    * average. The per-customer aggregate grows with the data — never force
    * its broadcast; AQE picks one at test SF, a co-partitioned shuffle
    * join at scale (both sides already hash by customer key). */
  def q20AboveAvg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val custAvg = o.groupBy(col("o_custkey").as("ck"))
      .agg(davg(col("o_totalprice")).as("avg_price"))
    o.join(custAvg, col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > col("avg_price"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_above"))
  }

  /** Pearson correlation via the explicit moment formula over exact decimal
    * sums: built-in corr() accumulates doubles in partition order (results
    * drift across partitionings and engines); exact Σx/Σy/Σxy/Σx²/Σy² make
    * the final double formula bit-reproducible anywhere. */
  def q59Stats(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val x = dec(col("l_quantity")); val y = dec(col("l_extendedprice"))
    val m = li.agg(
      count(lit(1)).cast(DoubleType).as("n"),
      sum(x).cast(DoubleType).as("sx"),
      sum(y).cast(DoubleType).as("sy"),
      sum(x * y).cast(DoubleType).as("sxy"),
      sum(x * x).cast(DoubleType).as("sxx"),
      sum(y * y).cast(DoubleType).as("syy"))
    // round(…, 12): sums like Σy² exceed 2⁵³ at their fixed-point scale, and
    // engines legally differ in the last ulp of that decimal→double cast
    // (DuckDB double-rounds through int128/10^scale, the JVM rounds the
    // exact decimal once); the correlation's cancellation amplifies that to
    // ~2 ulp — never emit unrounded computed doubles across engines
    m.select(
      col("n").cast(LongType).as("n_rows"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
         sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 12).as("corr_qty_price"))
  }

  /** CUBE grouping sets over two dimensions. */
  def q60Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))

  /** Pivot (long→wide reshape): per-returnflag quantity totals spread into
    * one column per line status. The EXPLICIT value list matters at scale —
    * `pivot(col)` without values runs a distinct scan first AND caps wide
    * output at `spark.sql.pivotMaxValues`; with pinned values the whole
    * reshape is ONE pass, planned as the same partial+final hash
    * aggregation as q01 (each pivot cell a conditional decimal sum — no
    * extra shuffle, no transpose operator). Missing combinations surface
    * as NULL cells, matching SQL's CASE-sum semantics. */
  def q90Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity")))

  /** GROUPING SETS through the SQL entry point (Views.register → bare
    * table names in `spark.sql`) — the general form cube (q60) and rollup
    * (q15) specialize; Catalyst plans it as ONE Expand over the scan (4
    * duplicated streams, one aggregation), not four scans unioned.
    * grouping() flags are cast to INT on both engines (Spark emits
    * tinyint, DuckDB bigint — the cast is the portable schema). */
  def q91GroupingSets(s: SparkSession, dir: String): DataFrame = {
    graft.core.Views.register(s, dir)
    // Re-aggregation form of GROUPING SETS ((flag,status),(flag),(status),())
    // (round 19, guide §2.3 "aggregate before you shuffle"): the literal
    // GROUPING SETS query plans as Expand ×4 — every fact row materialized
    // four times into the hash aggregate, 4× scan-volume CPU at any scale.
    // count and the exact DECIMAL sum are both reaggregable, so the three
    // coarser sets derive from the (flag, status) base aggregate's handful
    // of rows instead of from the fact table. grouping() flags become
    // literals per branch (data NULLs keep g=0 rows, exactly as GROUPING
    // SETS reports them); the empty-input () row keeps count 0 via
    // coalesce. Decimal reaggregation is exact (associative, no overflow
    // at 38 digits), and the double cast happens once at the end either
    // way — values bit-identical, oracle hash-matched. Steady
    // 1.73 → 0.91 s at sf0.1; Expand×4-of-fact → Expand-free.
    // DataFrame tiers off the persisted base (round 20, advisor): the r19
    // form registered a session-global temp view 'gs_base' as an operator
    // side effect — clobber- and race-prone. Same four branches, same
    // types (INT flags, BIGINT n, one double cast per branch), values
    // bit-identical; unionAll is positional like the SQL UNION ALL.
    val base = graft.core.InternalCaches.persist(s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
           sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
         FROM lineitem GROUP BY l_returnflag, l_linestatus"""))
    val nullS = lit(null).cast(StringType)
    val b1 = base.select(col("l_returnflag"), col("l_linestatus"),
      lit(0).as("g_flag"), lit(0).as("g_status"),
      col("n"), col("sq").cast(DoubleType).as("sum_qty"))
    val b2 = base.groupBy(col("l_returnflag"))
      .agg(sum(col("n")).as("n"), sum(col("sq")).as("sq"))
      .select(col("l_returnflag"), nullS.as("l_linestatus"),
        lit(0).as("g_flag"), lit(1).as("g_status"),
        col("n"), col("sq").cast(DoubleType).as("sum_qty"))
    val b3 = base.groupBy(col("l_linestatus"))
      .agg(sum(col("n")).as("n"), sum(col("sq")).as("sq"))
      .select(nullS.as("l_returnflag"), col("l_linestatus"),
        lit(1).as("g_flag"), lit(0).as("g_status"),
        col("n"), col("sq").cast(DoubleType).as("sum_qty"))
    val b4 = base
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"), sum(col("sq")).as("sq"))
      .select(nullS.as("l_returnflag"), nullS.as("l_linestatus"),
        lit(1).as("g_flag"), lit(1).as("g_status"),
        col("n"), col("sq").cast(DoubleType).as("sum_qty"))
    b1.unionAll(b2).unionAll(b3).unionAll(b4)
  }

  /** Correlated scalar subquery through the SQL entry point: the q20
    * semantics written the way a SQL user writes them — Catalyst must
    * DECORRELATE the per-customer average into an aggregate + join (no
    * per-row re-execution; asserted against q20's hand-decorrelated twin
    * in RelationalSpec). */
  def q92CorrelatedSql(s: SparkSession, dir: String): DataFrame = {
    graft.core.Views.register(s, dir)
    s.sql(
      """SELECT o_orderstatus, count(*) AS n_above
         FROM orders o
         WHERE o_totalprice > (
           SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    / count(*)
           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
         GROUP BY o_orderstatus""")
  }

  /** Exact per-group percentiles (median / p95) over BOUNDED-cardinality
    * measures — the exact twin of q67's GK sketch. Spark's `percentile`
    * aggregates a value→count map, so state is O(distinct values) per
    * group: on l_quantity (50 distinct) and l_discount (11) that is
    * constant at any corpus size, which is what makes the exact form
    * 100 TB-safe here; for high-cardinality measures the GK sketch (q67)
    * is the scale path. Results rounded to 6: both engines interpolate at
    * pos = p·(n−1), but the interpolation's float expression shape is
    * engine-internal, so the gate pins the rounded value. */
  def q96Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        round(expr("percentile(l_quantity, 0.5D)"), 6).as("med_qty"),
        round(expr("percentile(l_quantity, 0.95D)"), 6).as("p95_qty"),
        round(expr("percentile(l_discount, 0.5D)"), 6).as("med_disc"))

  /** Null-production and null-handling scalar functions (the fixtures carry
    * no nulls, so NULLIF manufactures them): nullif/coalesce/nvl2-style. */
  def q61Nulls(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
        col("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("disc_or_null")).as("n_nonnull"),
        sum(when(col("disc_or_null").isNull, 1).otherwise(0)).cast(LongType).as("n_null"),
        sum(coalesce(col("disc_or_null"), lit(0.0)).cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_disc"))

  /** Per-key top-k through the custom physical operator (graft.plans.TopK:
    * LogicalPlan + Strategy + bounded-heap exec with a map-side partial
    * pass) — result-identical to the q09 window formulation, verified by
    * the same oracle shape. */
  def q62TopKCustom(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.perKey(
      Tables.orders(s, dir).filter(col("o_custkey") < 200),
      keys = Seq("o_custkey"),
      orderBy = Seq(graft.plans.TopK.desc("o_totalprice"), graft.plans.TopK.asc("o_orderkey")),
      k = 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  /** Approximate sketches (HLL++ distinct, GK quantiles): the sublinear-
    * memory path for 100 TB cardinality/percentile questions. HLL register
    * merges are commutative → results are partitioning-independent; no SQL
    * oracle (engine-specific sketches), accuracy is property-tested against
    * exact values in RelationalSpec. */
  def q67ApproxSketches(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // every sketch aggregates SEPARATELY (one function per agg, cross-join
    // of single rows): mixing countDistinct with the object-hash percentile
    // forced the expand + sort-aggregate slow path (2× slower, round-13
    // measurement), and mixing countDistinct with approx_count_distinct is
    // worse still — RewriteDistinctAggregates then computes the partial HLL
    // PER l_orderkey GROUP, carrying a 410-long sketch buffer for every one
    // of the 150k groups through the exchange (~500 MB shuffled at sf0.1,
    // proportional to key cardinality at scale). Split, each aggregate
    // shuffles one partial buffer per map task; HLL merge is register-max,
    // so the split result is bit-identical (steady 2.3 → 0.8 s).
    val approx = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
    val exact = li.agg(countDistinct(col("l_orderkey")).as("exact_orders"))
    val quantiles = li.agg(
      percentile_approx(col("l_extendedprice"), array(lit(0.5), lit(0.99)), lit(1000)).as("p"))
      .select(col("p").getItem(0).as("approx_p50"), col("p").getItem(1).as("approx_p99"))
    approx.crossJoin(exact).crossJoin(quantiles)
  }

  /** Data-profiling operator: one stats row per profiled column (nulls,
    * distincts, min/max) — the ingest-time data-quality report. ONE
    * aggregate computes every column's stats in a single fact scan (the
    * multi-column countDistinct plans as one Expand + hash aggregation),
    * then a stack() unpivots the single wide row into per-column rows.
    * The previous 5-aggregate union cost 5 fact scans — exchange reuse does
    * not dedupe distinct aggregate subtrees — which is structural at
    * 100 TB even though it hides at test SF. */
  def q69Profile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val numCols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val strCols = Seq("l_returnflag", "l_linestatus")
    // Two aggregates, not one (round 19): mixing the 5 countDistincts with
    // the plain stats planned as ONE Expand ×6 — every fact row
    // materialized six times, and the null/min/max CASE-WHEN columns rode
    // every expanded copy, so the single "one scan" aggregate pushed 6×
    // rows × 16 columns through the hash aggregate. Split, the plain stats
    // are a pure vectorized single pass (no Expand) and the distinct-only
    // aggregate expands 6-wide ROWS instead of 16-wide (gid + 5 key cols).
    // Two columnar scans of a 5-column projection cost far less than the
    // 6× row blowup at any scale (steady 2.7 → 1.6 s, fingerprint
    // identical). The round-13 rule stands: never UNION per-column
    // aggregates (5 scans); this splits by AGGREGATE CLASS only.
    def statsFor(c: String, isStr: Boolean): Seq[Column] = Seq(
      sum(when(col(c).isNull, 1).otherwise(0)).cast(LongType).as(s"${c}_null"),
      (if (isStr) min(length(col(c))) else min(col(c))).cast(DoubleType).as(s"${c}_min"),
      (if (isStr) max(length(col(c))) else max(col(c))).cast(DoubleType).as(s"${c}_max"))
    val aggsPlain = count(lit(1)).as("n_rows") +:
      (numCols.map(statsFor(_, isStr = false)) ++ strCols.map(statsFor(_, isStr = true))).flatten
    val plain = li.agg(aggsPlain.head, aggsPlain.tail: _*)
    val dAggs = (numCols ++ strCols).map(c => countDistinct(col(c)).as(s"${c}_dist"))
    val dists = li.agg(dAggs.head, dAggs.tail: _*)
    val wide = plain.crossJoin(dists)
    val stacked = (numCols ++ strCols)
      .map(c => s"'$c', ${c}_null, ${c}_dist, ${c}_min, ${c}_max").mkString(", ")
    wide.selectExpr(
        s"stack(${numCols.size + strCols.size}, $stacked) AS (col_name, n_null, n_distinct, min_v, max_v)",
        "n_rows")
      .select(col("col_name"), col("n_rows"), col("n_null"),
              col("n_distinct"), col("min_v"), col("max_v"))
  }

  /** Bucketed range join: points joined to OVERLAPPING [lo, hi) intervals
    * without a nested-loop plan. Spark's native strategy for an
    * inequality-only join is BroadcastNestedLoopJoin — O(points ×
    * intervals) work and a broadcast of one whole side, both
    * scale-killers. Bucketizing restores an equi-join: each interval
    * explodes into the ceil(len/w)+1 width-`w` buckets it covers
    * (sequence + explode, codegen'd), each point maps to exactly ONE
    * bucket, and the bucket equi-join + residual v ∈ [lo, hi) filter is
    * shuffle-partitioned like any other join — AQE handles hot buckets.
    * Size `bucketWidth` near the typical interval length: too narrow
    * multiplies interval replicas, too wide multiplies residual-filter
    * fan-out. Intervals of unbounded length belong in a coarser bucket
    * tier, not this operator (documented precondition).
    *
    * Shared column names between the two inputs are allowed EXCEPT for
    * names the `pointVal`/`lo`/`hi` predicates reference — those would be
    * ambiguous at resolution time, so they fail loudly here. A shared
    * passthrough name merely appears twice in the output (rename or drop
    * one side first if the caller selects it by name afterwards). */
  def rangeJoin(points: DataFrame, pointVal: Column, intervals: DataFrame,
                lo: Column, hi: Column, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // Precondition (loud, not silent): the internal bucket column must not
    // collide with caller columns (withColumn would overwrite, the final
    // drop would eat every occurrence), and no column NAME referenced by
    // the join predicates may exist on both sides (name resolution against
    // the joined frame would be ambiguous). Names not referenced by any
    // predicate are the caller's business — they resolve fine.
    val bkt = "__graft_bkt"
    require(!points.columns.contains(bkt) && !intervals.columns.contains(bkt),
      s"rangeJoin inputs must not contain the internal column '$bkt'")
    val predicateNames = Seq(pointVal, lo, hi).flatMap { c =>
      org.apache.spark.sql.graftbridge.Bridge.catalystExpression(c).collect {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          u.nameParts.last
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          a.name
      }
    }.toSet
    val ambiguous = predicateNames
      .intersect(points.columns.toSet).intersect(intervals.columns.toSet)
    require(ambiguous.isEmpty,
      s"rangeJoin predicate columns exist on BOTH inputs and would be " +
        s"ambiguous: ${ambiguous.mkString(", ")} — rename one side")
    val pb = points.withColumn(bkt, floor(pointVal / bucketWidth).cast(LongType))
    val ib = intervals.withColumn(bkt,
      explode(sequence(floor(lo / bucketWidth).cast(LongType),
                       floor(hi / bucketWidth).cast(LongType))))
    pb.join(ib, pb(bkt) === ib(bkt) && pointVal >= lo && pointVal < hi)
      .drop(bkt)
  }

  /** Range-join gate: lineitem prices against 200 overlapping synthetic
    * price bands (len 500–2400, bucket width 1000) derived from supplier
    * keys with arithmetic the oracle replays verbatim. The oracle is the
    * plain inequality join — bit-identical results prove the bucketed
    * plan is a pure physical rewrite. */
  def q75RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.lineitem(s, dir).select(col("l_extendedprice").as("v"))
    val iv = Tables.supplier(s, dir)
      .filter(col("s_suppkey") < 200)
      .select(col("s_suppkey").as("iid"),
        ((col("s_suppkey") * 97) % 50000 + 900.0).as("lo"))
      .withColumn("hi", col("lo") + 500.0 + (col("iid") % 7).cast(DoubleType) * 250.0)
    rangeJoin(pts, col("v"), iv, col("lo"), col("hi"), bucketWidth = 1000.0)
      .groupBy(col("iid"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_points"),
           dsum(col("v")).as("sum_v"))
  }

  /** Multi-join optimizer stress gate (TPC-H Q5 shape): six tables, a
    * selective region+date filter, aggregation above the join tree. The
    * piecewise gates verify each join strategy alone; this one pins the
    * COMPOSITION — Catalyst must push both filters to their scans, pick
    * broadcast for every dimension that fits (at gate SF: all of them; at
    * 100 TB nation/region stay broadcast by the fixed-catalog hint,
    * supplier/customer/orders degrade to shuffle joins under AQE), and
    * order the joins so lineitem is probed once. Revenue runs over exact
    * decimals (order-independent) with ONE final double cast — the same
    * IEEE shape the DuckDB oracle computes, so the hash compare is
    * bit-exact. */
  def q78MultiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
              col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("o_orderdate") <  lit("1997-01-01").cast(TimestampType))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Aggregation-UNDER-join gate: two independently aggregated subqueries
    * (per-nation order revenue via customer; per-nation supplier capacity)
    * joined on the 25-key nation dimension. Complements q78 (join tree,
    * aggregate above): here Catalyst must keep BOTH partial+final
    * aggregations below the join and broadcast the tiny aggregated frames —
    * at any scale the join carries |nations| rows, never fact rows. The
    * ratio is one IEEE divide of two already-exact doubles, so the oracle
    * hash-matches. */
  def q79AggJoin(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(dsum(col("o_totalprice")).as("nat_rev"),
           count(lit(1)).as("n_orders"))
    val sup = Tables.supplier(s, dir)
      .groupBy(col("s_nationkey"))
      .agg(dsum(col("s_acctbal")).as("nat_bal"),
           count(lit(1)).as("n_supp"))
    rev.join(sup, col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("nat_rev"), col("n_orders"),
              col("nat_bal"), col("n_supp"),
              (col("nat_rev") / col("nat_bal")).as("rev_per_bal"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_agg_join"       -> (q79AggJoin _),
    "q78_multi_join"     -> (q78MultiJoin _),
    "q75_range_join"     -> (q75RangeJoin _),
    "q59_stats"          -> (q59Stats _),
    "q67_approx_sketches" -> (q67ApproxSketches _),
    "q69_profile"        -> (q69Profile _),
    "q60_cube"           -> (q60Cube _),
    "q61_nulls"          -> (q61Nulls _),
    "q62_topk_custom"    -> (q62TopKCustom _),
    "q90_pivot"          -> (q90Pivot _),
    "q91_grouping_sets"  -> (q91GroupingSets _),
    "q92_correlated_sql" -> (q92CorrelatedSql _),
    "q96_percentiles"    -> (q96Percentiles _),
    "q01_agg"            -> (q01Agg _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_topk"           -> (q03TopK _),
    "q04_join_broadcast" -> (q04JoinBroadcast _),
    "q05_star_join"      -> (q05StarJoin _),
    "q06_semi_join"      -> (q06SemiJoin _),
    "q07_anti_join"      -> (q07AntiJoin _),
    "q08_distinct"       -> (q08Distinct _),
    "q09_window_rank"    -> (q09WindowRank _),
    "q10_set_ops"        -> (q10SetOps _),
    "q11_case_when"      -> (q11CaseWhen _),
    "q12_scalar_math"    -> (q12ScalarMath _),
    "q13_string_fns"     -> (q13StringFns _),
    "q14_date_fns"       -> (q14DateFns _),
    "q15_rollup"         -> (q15Rollup _),
    "q16_having"         -> (q16Having _),
    "q17_in_between"     -> (q17InBetween _),
    "q18_json"           -> (q18Json _),
    "q19_window_cum"     -> (q19WindowCum _),
    "q20_above_avg"      -> (q20AboveAvg _),
  )

  /** DuckDB-dialect oracle SQL, value-identical to the queries above. */
  val oracles: Map[String, String] = Map(
    "q79_agg_join" ->
      """WITH rev AS (
           SELECT c_nationkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS nat_rev,
             count(*) AS n_orders
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_nationkey),
         sup AS (
           SELECT s_nationkey,
             CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS nat_bal,
             count(*) AS n_supp
           FROM supplier GROUP BY s_nationkey)
         SELECT n_name, nat_rev, n_orders, nat_bal, n_supp,
           nat_rev / nat_bal AS rev_per_bal
         FROM rev JOIN sup ON rev.c_nationkey = sup.s_nationkey
         JOIN nation ON rev.c_nationkey = n_nationkey""",
    "q78_multi_join" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name""",
    "q75_range_join" ->
      """WITH iv AS (SELECT s_suppkey AS iid,
           (s_suppkey * 97) % 50000 + 900.0 AS lo,
           ((s_suppkey * 97) % 50000 + 900.0) + 500.0 + CAST(s_suppkey % 7 AS DOUBLE) * 250.0 AS hi
         FROM supplier WHERE s_suppkey < 200)
         SELECT iid, lo, hi, count(*) AS n_points,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM lineitem JOIN iv
           ON l_extendedprice >= lo AND l_extendedprice < hi
         GROUP BY iid, lo, hi""",
    "q59_stats" ->
      """WITH m AS (SELECT
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
         FROM lineitem)
         SELECT CAST(n AS BIGINT) AS n_rows,
           round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12) AS corr_qty_price
         FROM m""",
    "q60_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q69_profile" ->
      """SELECT 'l_quantity' AS col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(min(l_quantity) AS DOUBLE) AS min_v, CAST(max(l_quantity) AS DOUBLE) AS max_v
         FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice', count(*),
           CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT l_extendedprice),
           CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE)
         FROM lineitem
         UNION ALL
         SELECT 'l_discount', count(*),
           CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT l_discount),
           CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE)
         FROM lineitem
         UNION ALL
         SELECT 'l_returnflag', count(*),
           CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT l_returnflag),
           CAST(min(length(l_returnflag)) AS DOUBLE), CAST(max(length(l_returnflag)) AS DOUBLE)
         FROM lineitem
         UNION ALL
         SELECT 'l_linestatus', count(*),
           CAST(sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT l_linestatus),
           CAST(min(length(l_linestatus)) AS DOUBLE), CAST(max(length(l_linestatus)) AS DOUBLE)
         FROM lineitem""",
    // q90: the CASE-sum formulation IS pivot's semantics; column names
    // must equal Spark's pivot output ("F", "O")
    "q90_pivot" ->
      """SELECT l_returnflag,
         CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
         CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O"
         FROM lineitem GROUP BY l_returnflag""",
    "q91_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(grouping(l_returnflag) AS INT) AS g_flag,
         CAST(grouping(l_linestatus) AS INT) AS g_status,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), (l_linestatus), ())""",
    "q92_correlated_sql" ->
      """SELECT o_orderstatus, count(*) AS n_above
         FROM orders o
         WHERE o_totalprice > (
           SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    / count(*)
           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
         GROUP BY o_orderstatus""",
    "q96_percentiles" ->
      """SELECT l_returnflag, count(*) AS n,
           round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
           round(quantile_cont(l_quantity, 0.95), 6) AS p95_qty,
           round(quantile_cont(l_discount, 0.5), 6) AS med_disc
         FROM lineitem GROUP BY l_returnflag""",
    "q62_topk_custom" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders WHERE o_custkey < 200) t
         WHERE rk <= 3""",
    "q61_nulls" ->
      """SELECT l_returnflag, count(*) AS n_rows,
         count(nullif(l_discount, 0.0)) AS n_nonnull,
         CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         CAST(sum(CAST(coalesce(nullif(l_discount, 0.0), 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
         FROM lineitem GROUP BY l_returnflag""",
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
           AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""",
    "q03_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""",
    "q04_join_broadcast" ->
      """SELECT p_brand,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS brand_rev,
         count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""",
    "q05_star_join" ->
      """SELECT r_name,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS region_rev,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q06_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment""",
    "q07_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment""",
    "q08_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
         count(DISTINCT (o_orderstatus, o_orderpriority)) AS n_status_prio
         FROM orders""",
    "q09_window_rank" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders) t
         WHERE rk <= 3 AND o_custkey < 200""",
    "q10_set_ops" ->
      """WITH supn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier),
            cusn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
            tagged AS (
              SELECT nk, 'both' AS which FROM (SELECT nk FROM supn INTERSECT SELECT nk FROM cusn)
              UNION ALL
              SELECT nk, 'sup_only' AS which FROM (SELECT nk FROM supn EXCEPT SELECT nk FROM cusn))
         SELECT which, count(*) AS n, CAST(sum(nk) AS BIGINT) AS sum_nk FROM tagged GROUP BY which""",
    "q11_case_when" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0.0 AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_f
         FROM orders GROUP BY o_orderpriority""",
    "q12_scalar_math" ->
      """SELECT CAST(floor((value - 250.0) / 10.0) AS INTEGER) AS bucket,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM events GROUP BY 1""",
    "q13_string_fns" ->
      """SELECT string_split(p_type, ' ')[1] AS type_head,
         upper(substring(p_brand, 1, 7)) AS brand_up,
         count(*) AS n,
         CAST(sum(length(p_name)) AS BIGINT) AS sum_len
         FROM part GROUP BY 1, 2""",
    "q14_date_fns" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
         FROM orders GROUP BY 1, 2""",
    "q15_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q16_having" ->
      """SELECT p_brand, count(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand HAVING count(*) > 2000""",
    "q17_in_between" ->
      """SELECT p_brand, count(*) AS n, CAST(sum(p_size) AS BIGINT) AS sum_size
         FROM part
         WHERE p_size BETWEEN 10 AND 20 AND p_brand IN ('Brand#1','Brand#2','Brand#3')
         GROUP BY p_brand""",
    "q18_json" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, 'k') AS INTEGER)) AS BIGINT) AS sum_k,
         max(CAST(json_extract_string(props, 'k') AS INTEGER)) AS max_k
         FROM events GROUP BY event_type""",
    "q19_window_cum" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_rev
         FROM orders WHERE o_custkey < 100""",
    "q20_above_avg" ->
      """WITH ca AS (SELECT o_custkey AS ck,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
           FROM orders GROUP BY o_custkey)
         SELECT o_orderstatus, count(*) AS n_above
         FROM orders JOIN ca ON o_custkey = ck
         WHERE o_totalprice > avg_price
         GROUP BY o_orderstatus""",
  )
}
