package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration. Local mode
  * sizes shuffle partitions to the core count; on a cluster, leave master
  * to spark-submit and size `spark.sql.shuffle.partitions` to 2-3× total
  * executor cores (and let AQE coalesce down). */
object Sessions {

  def local(app: String = "graft", cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(SparkSession.builder().appName(app).master(s"local[$cores]"), cores).getOrCreate()

  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // RDD-lane shuffles/broadcasts (the HITS co-partitioned loop, the
    // logreg treeAggregate) serialize records with Kryo — Tungsten rows
    // never touch this, but Java serialization on boxed tuples makes an
    // RDD shuffle several times wider than it needs to be
    .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
}
