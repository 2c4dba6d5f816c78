package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided star schema (see /root/repo/TESTDATA.md;
  * note TESTDATA.md lists the 8 TPC-H-ish tables — `documents` and
  * `embeddings` are additional LLM-pipeline fixtures present in the same
  * sf directories).
  *
  * Every loader is a plain parquet scan: Catalyst handles column pruning and
  * predicate pushdown from whatever the caller selects/filters downstream,
  * so these stay unfiltered and unprojected on purpose. At cluster scale the
  * same code reads a partitioned table directory; nothing here assumes
  * single-file layout.
  */
object Tables {
  private def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame     = s.read.parquet(path(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame     = s.read.parquet(path(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame   = s.read.parquet(path(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame   = s.read.parquet(path(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame       = s.read.parquet(path(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame     = s.read.parquet(path(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame   = s.read.parquet(path(dir, "lineitem"))
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read it as a long (legacy conf) and normalize to a µs
    * TimestampType column so downstream operators see a standard timestamp.
    * ns→µs truncation matches DuckDB's ns→ms truncation on the positive
    * axis, so epoch-ms comparisons agree across engines.
    *
    * A rewritten events table (e.g. tools/make_sf1.py's scaled tier — no
    * writer in this stack can EMIT nanos) carries a standard µs TIMESTAMP
    * instead; the legacy conf leaves µs columns untouched, so branch on
    * the loaded type: long ⇒ nanos file, normalize; timestamp ⇒ already
    * µs, pass through. Values agree because both paths floor toward µs. */
  def events(s: SparkSession, dir: String): DataFrame = {
    // scope the legacy toggle to this schema-resolution only: set, resolve
    // the scan (schema is captured eagerly at read time), then restore, so
    // a loader call does not silently change how every OTHER nanos-parquet
    // read in the session behaves
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      val df = s.read.parquet(path(dir, "events"))
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // integral `div`, not `/`: epoch-ns (~1.7e18) exceeds double precision
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // a rewritten file stores naive µs wall times equal to the nanos
          // file's UTC instants; the UTC session tz makes this cast the
          // identity on the underlying micros, and downstream unix_millis
          // needs TIMESTAMP, not TIMESTAMP_NTZ
          df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(path(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(path(dir, "embeddings"))
}
