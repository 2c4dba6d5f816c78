package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: interleaved A/B of one gate query under two values of a system
  * property, all in ONE JVM so window noise hits both arms equally.
  * Usage: Test/runMain graft.DevABProbe <query> <prop> <valA> <valB> [reps] */
object DevABProbe {
  def main(args: Array[String]): Unit = {
    val Array(name, prop, valA, valB) = args.take(4)
    val reps = args.lift(4).map(_.toInt).getOrElse(6)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      graft.core.InternalCaches.release(spark)
      t
    }
    // warm both arms
    sys.props(prop) = valA; once()
    sys.props(prop) = valB; once()
    val a = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) {
      sys.props(prop) = valA; a += once()
      sys.props(prop) = valB; b += once()
    }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(" ")
    println(f"AB $name A($prop=$valA): ${fmt(a.toSeq)} min=${a.min}%.2f")
    println(f"AB $name B($prop=$valB): ${fmt(b.toSeq)} min=${b.min}%.2f")
    spark.stop()
  }
}
