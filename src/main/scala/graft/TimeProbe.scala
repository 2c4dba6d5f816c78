package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: steady-state timing of named gate queries (5 noop-sink runs
  * each) at sf0.1 — the per-query twin of PlanDump for chasing local
  * regressions. Usage: runMain graft.TimeProbe q66_pipeline_summary */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (name <- args) {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
