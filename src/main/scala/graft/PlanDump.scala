package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: print the formatted physical plan of named gate queries at
  * sf0.01 (the source of PLANS.md). Usage: runMain graft.PlanDump q41_... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"#### PLAN $name ####")
      println(df.queryExecution.explainString(FormattedMode))
      println(s"#### END $name ####")
    }
    spark.stop()
  }
}
