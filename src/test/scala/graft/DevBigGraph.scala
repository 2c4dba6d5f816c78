package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count => fcount, lit, max, min}

/** Dev-only: focused quiet-window re-measure of the contested BIG graph
  * anchors (hits_1m, pagerank_1m) in a FRESH JVM — the committed
  * BENCH_BIG can run its graph section in the decay tail of its own
  * earlier sections once the wall budget trips the load gates, so this
  * probe reproduces the anchor workload alone with the same meters. */
object DevBigGraph {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 1000000L
    val base = spark.range(n).toDF("i")
    def chord(k: Long) =
      base.select(col("i").as("d1"), ((col("i") + k) % n).as("d2"))
    val edges2 = graft.core.InternalCaches.persist(
      chord(1L).union(chord(2L)).union(chord(7919L)))
    edges2.count()
    def hitsOnce(): Unit = {
      val r = graft.ops.Embeddings.hits(edges2, iters = 3)
        .agg(min(col("hub_units")), max(col("hub_units")),
          fcount(lit(1))).head
      require((0 to 1).forall(i => r.getLong(i) == 1000000L) && r.getLong(2) == n,
        s"hits anchor mismatch: $r")
    }
    def fmt(m: Bench.RepMeter) = f"${m.sec}%.2f(f=${m.foreign}%.2f,io=${m.iowaitCores}%.2f)"
    sys.props("graft.ckpt.eager") = "true"; hitsOnce() // warm JIT, eager arm
    sys.props("graft.ckpt.eager") = "false"; hitsOnce() // warm, lazy arm
    val e = Vector.fill(2)(Bench.timeWithForeign(hitsOnce()))
    sys.props("graft.ckpt.eager") = "true"
    val g = Vector.fill(2)(Bench.timeWithForeign(hitsOnce()))
    sys.props("graft.ckpt.eager") = "false"
    val e2 = Vector.fill(2)(Bench.timeWithForeign(hitsOnce()))
    sys.props("graft.ckpt.eager") = "true"
    val g2 = Vector.fill(2)(Bench.timeWithForeign(hitsOnce()))
    println(s"HITS1M LAZY  ${(e ++ e2).map(fmt).mkString(" ")} loadavg=${Bench.loadAvg()}")
    println(s"HITS1M EAGER ${(g ++ g2).map(fmt).mkString(" ")}")
    spark.stop()
  }
}
