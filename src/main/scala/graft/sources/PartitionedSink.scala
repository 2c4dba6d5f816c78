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

  /** Size-controlled write: caps records per file and repartitions to a
    * target file count first — the two levers against the small-files
    * problem (a 100 TB table written from 10 000 tasks × 200 partitions
    * without this produces millions of KB-sized files and a dead
    * namenode/listing path). */
  def writeSized(df: DataFrame, path: String, targetFiles: Int,
                 maxRecordsPerFile: Long, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.repartition(targetFiles).write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "zstd")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }
}
