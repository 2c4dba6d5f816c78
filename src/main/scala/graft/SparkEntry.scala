package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Ann, Clustering, Embeddings, Events, Geometry, Pipeline, Relational, Skew, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 plus the
  * training-data-pipeline operators); `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible query. Keys without an oracle entry
  * (FFT, approximate sketches, IVF ANN, multimodal) get the driver's
  * rows-only check — they are deterministic but not expressible in ANSI SQL.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Geometry.queries ++ Text.queries ++
      Embeddings.queries ++ Events.queries ++ Skew.queries ++
      Pipeline.queries ++ Ann.queries ++ Clustering.queries ++
      graft.multimodal.Multimodal.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Geometry.oracles ++ Text.oracles ++
      Embeddings.oracles ++ Events.oracles ++ Skew.oracles ++
      Pipeline.oracles ++ Ann.oracles ++ Clustering.oracles ++
      graft.multimodal.Multimodal.oracles
}
