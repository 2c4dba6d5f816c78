package graft.core

import org.apache.spark.sql.SparkSession

/** Temp-view registration for the SQL-first user: after `register`, every
  * table is addressable from `spark.sql(...)` by its bare name, with the
  * graft native functions available (graft_dot / graft_shingles /
  * graft_zorder) — the full engine surface without touching the DataFrame
  * API. */
object Views {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case name =>
        spark.read.parquet(s"$dir/$name.parquet").createOrReplaceTempView(name)
    }
  }
}
