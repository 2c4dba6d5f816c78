package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table sink for co-located joins: writing both sides of a
  * recurring join bucketed (and sorted) by the join key lets Spark plan a
  * sort-merge join with ZERO shuffle — at 100 TB the difference between a
  * join that moves the whole fact table over the network every query and
  * one that only streams local buckets. Bucket counts must match across
  * join sides.
  */
object Bucketed {

  /** Write `df` as a bucketed, sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * sides were written with [[writeBucketed]] and equal bucket counts. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
