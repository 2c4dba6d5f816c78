package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: interleaved eager-vs-lazy checkpoint A/B of bpeTrain at 1M
  * docs — one JVM, alternating arms, so window noise hits both equally. */
object DevBigBpe {
  def main(args: Array[String]): Unit = {
    val nMerges = args.headOption.map(_.toInt).getOrElse(8)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.SyntheticDocs.planted(spark, nBase = 1000000L, nPlant = 0L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def once(eager: Boolean): Double = {
      sys.props("graft.ckpt.eager") = eager.toString
      val t0 = System.nanoTime()
      val m = graft.ops.Text.bpeTrain(docs, nMerges = nMerges).collect()
      require(m.length == nMerges, s"got ${m.length}")
      val t = (System.nanoTime() - t0) / 1e9
      graft.core.InternalCaches.release(spark)
      t
    }
    once(true); once(false) // warm both arms
    val e = (1 to reps).map(_ => once(true))
    val l = (1 to reps).map(_ => once(false))
    // interleave a second pass to be window-fair
    val e2 = (1 to reps).map(_ => once(true))
    val l2 = (1 to reps).map(_ => once(false))
    def fmt(x: Seq[Double]) = x.map(v => f"$v%.2f").mkString(" ")
    println(f"BPEAB merges=$nMerges EAGER ${fmt(e)} | ${fmt(e2)} min=${(e ++ e2).min}%.2f")
    println(f"BPEAB merges=$nMerges LAZY  ${fmt(l)} | ${fmt(l2)} min=${(l ++ l2).min}%.2f")
    spark.stop()
  }
}
