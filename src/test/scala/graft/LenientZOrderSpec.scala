package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Lenient

class LenientZOrderSpec extends SparkSpec {

  test("lenient CSV quarantines malformed rows, keeps clean ones") {
    val dir = Files.createTempDirectory("graft_lenient")
    val f = dir.resolve("pts.csv")
    Files.writeString(f, "1.0,2.0\ngarbage_line\n3.0,4.0\n5.0,not_a_number\n")
    val schema = StructType(Seq(
      StructField("x", DoubleType), StructField("y", DoubleType)))
    val (clean, dirty) = Lenient.partitionClean(
      Lenient.readCsv(spark, f.toString, schema))
    assert(clean.count() == 2)
    assert(dirty.count() == 2)
    val dirtyLines = dirty.collect().map(_.getString(0)).toSet
    assert(dirtyLines.exists(_.contains("garbage_line")))
  }

  test("zorder interleave: known bit patterns and negative handling") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (-1L, 0L))
      .toDF("i", "j")
      .selectExpr("i", "j", "graft_zorder(i, j) as z")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // offset-binary sign flip: z(0,0) has both sign bits set
    assert(rows((1L, 0L)) == rows((0L, 0L)) + 1)       // x occupies even bits
    assert(rows((0L, 1L)) == rows((0L, 0L)) + 2)       // y occupies odd bits
    assert(rows((1L, 1L)) == rows((0L, 0L)) + 3)
    assert(rows((-1L, 0L)) < rows((0L, 0L)))           // negatives sort below
  }

  test("zorder clustering: consecutive rows after z-sort are spatial neighbors") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val pts = Seq.fill(4000)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
      .toDF("i", "j")
    def avgConsecutiveCheb(df: org.apache.spark.sql.DataFrame): Double = {
      val arr = df.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
      arr.sliding(2).map { case Array(a, b) =>
        math.max(math.abs(a._1 - b._1), math.abs(a._2 - b._2)).toDouble
      }.sum / (arr.length - 1)
    }
    val zsorted = avgConsecutiveCheb(
      pts.orderBy(expr("graft_zorder(cast(i as int), cast(j as int))")))
    val unsorted = avgConsecutiveCheb(pts)
    // z-order locality: consecutive rows are an order of magnitude closer
    assert(zsorted * 5 < unsorted, s"zsorted=$zsorted unsorted=$unsorted")
  }
}
