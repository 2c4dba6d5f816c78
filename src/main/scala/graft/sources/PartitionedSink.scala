package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hive-style partitioned parquet sink: the layout that makes partition
  * pruning work — a filter on the partition column turns a 100 TB scan
  * into a directory listing plus the matching partitions only. Partition
  * columns should be low-cardinality (date, region, event_type); high-
  * cardinality partitioning produces a small-files explosion instead.
  */
object PartitionedSink {

  def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
