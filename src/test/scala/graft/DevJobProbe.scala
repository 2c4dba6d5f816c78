package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Dev-only: per-Spark-job timing breakdown of one gate query (default
  * q166_hits) — run via `Test/runMain graft.DevJobProbe [query]` to see
  * where a multi-job iterative operator's wall-clock actually goes. */
object DevJobProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q166_hits")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new scala.collection.mutable.ArrayBuffer[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = jobs.get(j.jobId)
        if (s != null) done.synchronized {
          done += ((j.jobId, (System.nanoTime() - s._1) / 1000000, s._2.take(70))) }
      }
    })
    def once(): Unit = {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      graft.core.InternalCaches.release(spark)
    }
    once(); once(); once()
    done.synchronized { done.clear() }
    val t0 = System.nanoTime()
    once()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    Thread.sleep(500)
    done.synchronized {
      done.sortBy(_._1).foreach { case (id, ms, d) =>
        println(f"JOB $id%4d $ms%6d ms  $d") }
      println(s"SUMjobs ${done.map(_._2).sum} ms over ${done.size} jobs")
    }
    spark.stop()
  }
}
