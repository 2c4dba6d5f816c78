package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Dev scratchpad for optimization-round A/B experiments: times named
  * query variants with the noop sink (5 runs) and prints a result
  * fingerprint (count + xxhash over the stringified sorted rows) so a
  * candidate rewrite proves result-identity before it touches the real
  * operator. NOT part of any graded surface; deleted or left dormant
  * between rounds. */
object OptLab {
  private def fingerprint(df: DataFrame): String = {
    val cols = df.columns.map(c => col(c).cast("string")).toSeq
    val row = df.select(
      count(lit(1)).as("n"),
      sum(xxhash64(concat_ws("|", cols: _*)).cast("decimal(38,0)")).as("h")).collect()(0)
    s"n=${row.get(0)} h=${row.get(1)}"
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    if (sys.env.get("SPARK_GRAFT_NOINFER").contains("1"))
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .limit(10000).groupBy("l_returnflag").count().collect()

    def time1(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def bench(name: String)(df: => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      val runs = (1 to 5).map(_ => time1(df))
      val fp = fingerprint(df)
      println(f"LAB $name%-28s ${runs.map(v => f"$v%.2f").mkString(" ")}  $fp")
      spark.sparkContext.setJobDescription(null)
    }

    val variants: Map[String, () => DataFrame] = Map(
      // ---- q159 baseline and fused single-scan candidate ----
      "q159_base" -> (() => SparkEntry.queries("q159_oov_rate")(spark, dir)),
      "q159_fused" -> { () =>
        val sh = graft.ops.Text.withTokens(graft.core.Tables.documents(spark, dir))
          .withColumn("t", expr(
            "transform(sequence(1, greatest(size(t) - 2, 1)), " +
              "i -> concat_ws(' ', slice(t, i, 3)))"))
        val counts = graft.core.InternalCaches.persist(
          sh.select(col("source"), (col("doc_id") % 2 === 0).as("is_train"),
              explode(col("t")).as("w"))
            .groupBy(col("source"), col("is_train"), col("w"))
            .agg(count(lit(1)).cast(LongType).as("cnt")))
        val vocab = counts.filter(col("is_train"))
          .groupBy(col("w")).agg(sum(col("cnt")).cast(LongType).as("freq"))
          .orderBy(col("freq").desc, col("w").asc).limit(500)
          .select(col("w"), lit(1).as("in_vocab"))
        counts.filter(!col("is_train"))
          .join(broadcast(vocab), Seq("w"), "left")
          .groupBy(col("source"))
          .agg(sum(col("cnt")).cast(LongType).as("n_tokens"),
            sum(when(col("in_vocab").isNull, col("cnt")).otherwise(0L))
              .cast(LongType).as("n_oov"))
          .withColumn("oov_rate", round(
            col("n_oov").cast(DoubleType) / col("n_tokens"), 6))
          .orderBy(col("source"))
      },
      // ---- q69 baseline ----
      "q69_base" -> (() => SparkEntry.queries("q69_profile")(spark, dir)),
      "q69_split" -> { () =>
        import org.apache.spark.sql.Column
        val li = graft.core.Tables.lineitem(spark, dir)
        val numCols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val strCols = Seq("l_returnflag", "l_linestatus")
        def statsFor(c: String, isStr: Boolean): Seq[Column] = Seq(
          sum(when(col(c).isNull, 1).otherwise(0)).cast(LongType).as(s"${c}_null"),
          (if (isStr) min(length(col(c))) else min(col(c))).cast(DoubleType).as(s"${c}_min"),
          (if (isStr) max(length(col(c))) else max(col(c))).cast(DoubleType).as(s"${c}_max"))
        val aggsPlain = count(lit(1)).as("n_rows") +:
          (numCols.map(statsFor(_, isStr = false)) ++ strCols.map(statsFor(_, isStr = true))).flatten
        val plain = li.agg(aggsPlain.head, aggsPlain.tail: _*)
        val dAggs = (numCols ++ strCols).map(c => countDistinct(col(c)).as(s"${c}_dist"))
        val dists = li.agg(dAggs.head, dAggs.tail: _*)
        val wide = plain.crossJoin(dists)
        val stacked = (numCols ++ strCols)
          .map(c => s"'$c', ${c}_null, ${c}_dist, ${c}_min, ${c}_max").mkString(", ")
        wide.selectExpr(
            s"stack(${numCols.size + strCols.size}, $stacked) AS (col_name, n_null, n_distinct, min_v, max_v)",
            "n_rows")
          .select(col("col_name"), col("n_rows"), col("n_null"),
                  col("n_distinct"), col("min_v"), col("max_v"))
      },
      // ---- q67 baseline ----
      "q67_base" -> (() => SparkEntry.queries("q67_approx_sketches")(spark, dir)),
      "q67_split" -> { () =>
        val li = graft.core.Tables.lineitem(spark, dir)
        val approx = li.agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
        val exact = li.agg(countDistinct(col("l_orderkey")).as("exact_orders"))
        val quantiles = li.agg(
          percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.99)), lit(1000)).as("p"))
          .select(col("p").getItem(0).as("approx_p50"),
            col("p").getItem(1).as("approx_p99"))
        approx.crossJoin(exact).crossJoin(quantiles)
      }
    )

    val variants2: Map[String, () => DataFrame] = Map(
      "q91_base" -> (() => SparkEntry.queries("q91_grouping_sets")(spark, dir)),
      "q91_reagg" -> { () =>
        graft.core.Views.register(spark, dir)
        val base = graft.core.InternalCaches.persist(spark.sql(
          """SELECT l_returnflag, l_linestatus, count(*) AS n,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
             FROM lineitem GROUP BY l_returnflag, l_linestatus"""))
        base.createOrReplaceTempView("gs_base")
        spark.sql(
          """SELECT l_returnflag, l_linestatus, 0 AS g_flag, 0 AS g_status,
                    n, CAST(sq AS DOUBLE) AS sum_qty FROM gs_base
             UNION ALL
             SELECT l_returnflag, CAST(NULL AS STRING), 0, 1,
                    sum(n), CAST(sum(sq) AS DOUBLE) FROM gs_base GROUP BY l_returnflag
             UNION ALL
             SELECT CAST(NULL AS STRING), l_linestatus, 1, 0,
                    sum(n), CAST(sum(sq) AS DOUBLE) FROM gs_base GROUP BY l_linestatus
             UNION ALL
             SELECT CAST(NULL AS STRING), CAST(NULL AS STRING), 1, 1,
                    coalesce(sum(n), 0L), CAST(sum(sq) AS DOUBLE) FROM gs_base""")
      },
      "q01_base" -> (() => SparkEntry.queries("q01_agg")(spark, dir)),
      "q135_cur" -> (() => SparkEntry.queries("q135_gopher_repetition")(spark, dir)),
      "q127_cur" -> (() => SparkEntry.queries("q127_fivegram_score")(spark, dir)),
      "q38_cur" -> (() => SparkEntry.queries("q38_wordcount")(spark, dir)),
      "q159_cur" -> (() => SparkEntry.queries("q159_oov_rate")(spark, dir)),
      "q186_cur" -> (() => SparkEntry.queries("q186_unigram_apply")(spark, dir)),
      "q127_fusedgrams" -> { () =>
        import org.apache.spark.sql.types.DecimalType
        val alpha = 0.4
        val docs = graft.core.Tables.documents(spark, dir)
        val train = docs.filter(expr("doc_id % 2 = 0"))
        val eval0 = docs.filter(expr("doc_id % 2 = 1"))
        def gramExpr(n: Int): org.apache.spark.sql.Column = expr(
          s"transform(sequence($n, size(t)), i -> struct(" +
            (1 to n).map(j => s"element_at(t, i - ${n - j}) AS w$j").mkString(", ") + "))")
        val trainTok = graft.core.InternalCaches.persist(
          graft.ops.Text.withTokens(train).select(col("t")))
        val fusedExpr =
          """flatten(transform(sequence(1, size(t)), i ->
               transform(sequence(1, least(5, i)), n -> struct(
                 n AS n,
                 element_at(t, i - n + 1) AS w1,
                 CASE WHEN n >= 2 THEN element_at(t, i - n + 2) END AS w2,
                 CASE WHEN n >= 3 THEN element_at(t, i - n + 3) END AS w3,
                 CASE WHEN n >= 4 THEN element_at(t, i - n + 4) END AS w4,
                 CASE WHEN n >= 5 THEN element_at(t, i - n + 5) END AS w5))))"""
        val gramAll = graft.core.InternalCaches.persist(
          trainTok.select(explode(expr(fusedExpr)).as("g"))
            .select(col("g.n").as("n"), col("g.w1").as("w1"), col("g.w2").as("w2"),
              col("g.w3").as("w3"), col("g.w4").as("w4"), col("g.w5").as("w5"))
            .groupBy(col("n"), col("w1"), col("w2"), col("w3"), col("w4"), col("w5"))
            .agg(count(lit(1)).cast(LongType).as("cnt")))
        def tier(n: Int, cntName: String): DataFrame =
          gramAll.filter(col("n") === n)
            .select((1 to n).map(j => col(s"w$j")) :+ col("cnt").as(cntName): _*)
        val n5 = tier(5, "n5"); val n4 = tier(4, "n4")
        val n3 = tier(3, "n3"); val n2 = tier(2, "n2")
        val n1 = tier(1, "n1").withColumnRenamed("w1", "w")
        val n5m = n5.join(broadcast(n4.withColumnRenamed("n4", "n4_ctx")),
          Seq("w1", "w2", "w3", "w4"))
        val n4m = n4.join(broadcast(n3.withColumnRenamed("n3", "n3_ctx")),
          Seq("w1", "w2", "w3"))
        val n3m = n3.join(broadcast(n2.withColumnRenamed("n2", "n2_ctx")),
          Seq("w1", "w2"))
        val n2m = n2.join(broadcast(n1.select(col("w").as("w1"),
          col("n1").as("n1_ctx"))), Seq("w1"))
        val tot = n1.agg(sum(col("n1")).cast(LongType).as("nn"),
          count(lit(1)).cast(LongType).as("v"))
        val a1 = lit(alpha)
        val a2 = lit(alpha) * lit(alpha)
        val a3 = (lit(alpha) * lit(alpha)) * lit(alpha)
        val a4 = ((lit(alpha) * lit(alpha)) * lit(alpha)) * lit(alpha)
        graft.ops.Text.withTokens(eval0).filter(size(col("t")) >= 5)
          .select(col("doc_id"), explode(gramExpr(5)).as("g"))
          .select(col("doc_id") +: (1 to 5).map(j => col(s"g.w$j")): _*)
          .join(broadcast(n5m), Seq("w1", "w2", "w3", "w4", "w5"), "left")
          .join(broadcast(n4m.select(col("w1").as("w2"), col("w2").as("w3"),
            col("w3").as("w4"), col("w4").as("w5"), col("n4").as("n4_hit"),
            col("n3_ctx"))),
            Seq("w2", "w3", "w4", "w5"), "left")
          .join(broadcast(n3m.select(col("w1").as("w3"), col("w2").as("w4"),
            col("w3").as("w5"), col("n3").as("n3_hit"), col("n2_ctx"))),
            Seq("w3", "w4", "w5"), "left")
          .join(broadcast(n2m.select(col("w1").as("w4"), col("w2").as("w5"),
            col("n2").as("n2_hit"), col("n1_ctx").as("n1_4"))),
            Seq("w4", "w5"), "left")
          .join(broadcast(n1.select(col("w").as("w5"), col("n1").as("n1_5"))),
            Seq("w5"), "left")
          .crossJoin(broadcast(tot))
          .withColumn("lp", round(log(
            when(col("n5").isNotNull,
              col("n5").cast(DoubleType) / col("n4_ctx"))
            .when(col("n4_hit").isNotNull,
              (a1 * col("n4_hit")) / col("n3_ctx"))
            .when(col("n3_hit").isNotNull,
              (a2 * col("n3_hit")) / col("n2_ctx"))
            .when(col("n2_hit").isNotNull,
              (a3 * col("n2_hit")) / col("n1_4"))
            .otherwise(
              (a4 * (coalesce(col("n1_5"), lit(0L)) + lit(1.0)))
                / (col("nn") + col("v")).cast(DoubleType))), 9))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).cast(LongType).as("n_fivegrams"),
            round(sum(col("lp").cast(DecimalType(28, 12))).cast(DoubleType)
              / count(lit(1)), 6).as("avg_lp"))
      }
    )

    val all = variants ++ variants2
    val names = if (args.nonEmpty) args.toSeq else all.keys.toSeq.sorted
    for (n <- names) bench(n)(all(n)())
    spark.stop()
  }
}
