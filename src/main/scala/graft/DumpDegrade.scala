package graft
object DumpDegrade {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q78_multi_join", "q79_agg_join")) {
      println(s"===== $q (autoBroadcastJoinThreshold=-1) =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
