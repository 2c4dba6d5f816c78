package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Skew mitigation operators (reference A6: the random-key two-round
  * aggregation of `WordCountExample.java:75-101` was the RDD-era version of
  * exactly this). AQE's skew-join handling covers most cases at runtime;
  * these explicit forms are for the planned-ahead case — a known-hot key
  * distribution at 100 TB where you don't want to discover skew at runtime.
  *
  * Both are *semantically transparent*: the salted plans produce
  * bit-identical results to their unsalted forms (verified by the DuckDB
  * oracle against the plain SQL), they only change the shuffle layout —
  * hot keys are split across `salt` reducers in round 1 and recombined in
  * a cheap round 2 over (keys × salt) rows.
  */
object Skew {

  /** Deterministic salt in [0, n) from a unique row key (deterministic so
    * verification runs are reproducible; rand() works equally at scale). */
  private def saltCol(unique: Column, n: Int): Column =
    pmod(xxhash64(unique), lit(n.toLong)).cast(IntegerType)

  /** Two-stage salted aggregation: count + exact decimal sum per hot key.
    * Stage 1 aggregates (key, salt) — splitting each hot key across `salt`
    * reducers; stage 2 recombines per key. Decimal sums keep the recombine
    * exact and order-free. */
  def saltedAggregate(df: DataFrame, key: Column, unique: Column, value: Column,
                      salt: Int = 16): DataFrame =
    df.withColumn("_salt", saltCol(unique, salt))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(value.cast(DecimalType(18, 2))).as("_s"))
      .groupBy(col("key"))
      .agg(sum(col("_n")).cast(LongType).as("n"),
           sum(col("_s")).cast(DoubleType).as("sum_v"))

  /** Salted broadcast-replicated join: the small side is exploded ×salt so
    * each (key, salt) bucket of the skewed fact side finds its match
    * without any single reducer owning a whole hot key. */
  def saltedJoin(fact: DataFrame, factKey: Column, factUnique: Column,
                 dim: DataFrame, dimKey: Column, salt: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", saltCol(factUnique, salt))
    val replicatedDim = dim
      .withColumn("_salt", explode(array((0 until salt).map(i => lit(i)): _*)))
    saltedFact.join(broadcast(replicatedDim),
      factKey === dimKey && saltedFact("_salt") === replicatedDim("_salt"))
      .drop("_salt")
  }

  // --------------------------------------------------- queries for the gate

  /** Salted aggregation over the 5-hot-key events table: result must equal
    * the plain GROUP BY (the oracle). */
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame =
    saltedAggregate(Tables.events(s, dir),
      key = col("event_type"), unique = col("event_id"), value = col("value"))

  /** Salted join of lineitem (3 extremely hot l_returnflag keys) against a
    * tiny derived dim, aggregated — equals the plain join. */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("flag_total"))
    saltedJoin(
      Tables.lineitem(s, dir), col("l_returnflag"), col("l_orderkey") * 10 + col("l_linenumber"),
      dim, col("flag"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
           first(col("flag_total")).as("flag_total"),
           sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_salted_agg"  -> (qSaltedAgg _),
    "q55_salted_join" -> (qSaltedJoin _),
  )

  val oracles: Map[String, String] = Map(
    "q54_salted_agg" ->
      """SELECT event_type AS key, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM events GROUP BY event_type""",
    "q55_salted_join" ->
      """WITH dim AS (SELECT l_returnflag AS flag, count(*) AS flag_total
           FROM lineitem GROUP BY l_returnflag)
         SELECT flag, count(*) AS n, min(flag_total) AS flag_total,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN dim ON l_returnflag = flag
         GROUP BY flag""",
  )
}
