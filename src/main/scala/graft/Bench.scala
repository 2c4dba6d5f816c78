package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Results are forced through the noop sink so the
  * full plan executes (a bare count() would let Spark prune the work). */
object Bench {
  /** Distinguishes a real golden-anchor failure from the generic
    * IllegalStateExceptions Spark throws for infrastructure states. */
  private final class GoldenMismatch(msg: String) extends RuntimeException(msg)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup: touch the scan + hash-agg + shuffle paths once so
    // the first measured query doesn't pay JIT cost
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .limit(10000).groupBy("l_returnflag").count().collect()
    // warm run (JIT + shuffle-file page cache) then measured run per query;
    // the noop sink forces full plan execution both times
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t = try { once(); once() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // BASELINE.md-comparable reference workloads (uber-100k, D=0.02 M=10):
    // published numbers are ExactOutliers 61 655 ms / MRApproxOutliers 960 ms
    val uber = "/root/reference/Homework_1/Data/uber-100k.csv"
    val ref = if (new java.io.File(uber).exists()) {
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      try {
        val pts = graft.sources.PointSource.read(spark, uber, cpus.toInt)
        pts.count()
        // same warm+measured discipline as the gate queries: first run pays
        // JIT/codegen, the second is the reported number
        var exactN = -1L
        def runExact(): Unit = exactN = graft.ops.Geometry.exactOutliers(pts, 0.02, 10).count()
        runExact()
        val tExact = time(runExact())
        var approxRows = Array.empty[org.apache.spark.sql.Row]
        def runApprox(): Unit = approxRows = graft.ops.Geometry.approxOutliers(pts, 0.02, 10).collect()
        runApprox()
        val tApprox = time(runApprox())
        graft.ops.Geometry.mrFFT(pts, k = 100, l = 16, deterministic = false)
        val tFft = time(graft.ops.Geometry.mrFFT(pts, k = 100, l = 16, deterministic = false))
        // golden anchors from the reference's published uber-100k output
        // (Homework_1/Data/Example/output_uber100k_0.02_10_5_2.pdf): 673
        // exact outliers, 435 sure, 658 uncertain. The bench TIMES this
        // workload every round — asserting the counts here means a silent
        // correctness regression on real data fails the bench loudly
        // instead of shipping a fast wrong answer.
        val byCls = approxRows.map(r => r.getString(0) -> r.getLong(1)).toMap
        val sure = byCls.getOrElse("sure", 0L)
        val unc = byCls.getOrElse("uncertain", 0L)
        if (exactN != 673L || sure != 435L || unc != 658L)
          throw new GoldenMismatch(
            s"uber-100k golden anchor MISMATCH: exact=$exactN (want 673) " +
            s"sure=$sure (want 435) uncertain=$unc (want 658)")
        f""","reference":{"exact_outliers_uber100k":$tExact%.3f,"approx_outliers_uber100k":$tApprox%.3f,"mrfft_k100_uber100k":$tFft%.3f}"""
      } catch {
        // only a genuine anchor mismatch fails the bench; transient
        // infrastructure failures degrade to an absent reference section
        case e: GoldenMismatch => throw e
        case _: Throwable => ""
      }
    } else ""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$ref}""")
    spark.stop()
  }
}
