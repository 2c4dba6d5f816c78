package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import graft.plans.BandJoinRule

class BandJoinRuleSpec extends SparkSpec {

  private def physical(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def hashJoins(df: org.apache.spark.sql.DataFrame) =
    physical(df).collect {
      case j: BroadcastHashJoinExec => j
      case j: ShuffledHashJoinExec => j
      case j: SortMergeJoinExec => j
    }

  private def nestedLoops(df: org.apache.spark.sql.DataFrame) =
    physical(df).collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }

  test("band join rewrites to an equi-join with identical results") {
    import spark.implicits._
    val a = (0L until 500L).map(i => (i * 3 % 101, i)).toDF("k", "va")
    val b = (0L until 500L).map(i => (i * 7 % 101, i)).toDF("kb", "vb")
    val cond = abs(col("k") - col("kb")) <= 2
    val plain = a.join(b, cond)
    assert(hashJoins(plain).isEmpty,
      s"without the rule a band join must not be an equi-join:\n${plain.queryExecution.executedPlan}")
    val expected = plain.collect().map(_.toSeq).toSet

    spark.experimental.extraOptimizations = Seq(BandJoinRule())
    try {
      val rewritten = a.join(b, cond)
      assert(hashJoins(rewritten).nonEmpty,
        s"expected a hash/merge equi-join after rewrite, got:\n${rewritten.queryExecution.executedPlan}")
      assert(nestedLoops(rewritten).isEmpty)
      assert(rewritten.collect().map(_.toSeq).toSet == expected)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("rule preserves extra conjuncts and ignores non-integral bands") {
    import spark.implicits._
    spark.experimental.extraOptimizations = Seq(BandJoinRule())
    try {
      val a = (0L until 200L).map(i => (i % 50, i)).toDF("k", "va")
      val b = (0L until 200L).map(i => (i % 50, i)).toDF("kb", "vb")
      // extra predicate survives the rewrite
      val mixed = a.join(b, abs(col("k") - col("kb")) <= 1 && col("va") < col("vb"))
      val expected = a.join(b, abs(col("k") - col("kb")) <= 1)
        .filter(col("va") < col("vb")).count()
      assert(mixed.count() == expected)
      // double-typed band must NOT be rewritten (semantics differ)
      val d1 = Seq((1.5, 1L), (2.0, 2L)).toDF("x", "i")
      val d2 = Seq((1.6, 3L)).toDF("y", "j")
      val dj = d1.join(d2, abs(col("x") - col("y")) <= 0.2)
      assert(dj.count() == 1)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }
}
