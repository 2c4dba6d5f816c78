package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Direct tests of the native SQL functions' edge semantics (the gate
  * queries exercise only well-formed inputs). */
class FunctionsSpec extends SparkSpec {

  private def one(sql: String): Row = {
    graft.functions.GraftFunctions.register(spark)
    spark.sql(s"SELECT $sql AS v").collect()(0)
  }

  test("graft_dot matches the HOF form on well-formed input") {
    val r = one(
      "graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
    assert(r.getDouble(0) == 32.0)
  }

  test("graft_dot: mismatched lengths yield NULL (zip_with pad semantics)") {
    assert(one("graft_dot(array(1.0D, 2.0D), array(1.0D))").isNullAt(0))
  }

  test("graft_dot: a null element yields NULL, not garbage") {
    assert(one("graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D))").isNullAt(0))
  }

  test("graft_dot: null array input yields NULL (null-intolerant)") {
    assert(one("graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))").isNullAt(0))
  }

  test("graft_dot: interpreted eval agrees with codegen on nulls") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // force a non-codegen context via an aggregation over eval results
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0)), (Array(1.0), Array(1.0, 2.0)))
      .toDF("a", "b")
      .selectExpr("graft_dot(a, b) AS d")
    val rows = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(rows.toSet == Set(Some(11.0), None))
  }

  test("graft_zorder available via SQL and interleaves correctly") {
    val r = one("graft_zorder(0, 0)")
    val r2 = one("graft_zorder(1, 0)")
    val r3 = one("graft_zorder(0, 1)")
    // sign-flipped coords: (0,0) maps to the interleave of 0x80000000 twice
    assert(r.getLong(0) != r2.getLong(0) && r2.getLong(0) != r3.getLong(0))
    assert((r2.getLong(0) ^ r.getLong(0)) == 1L)      // x occupies even bits
    assert((r3.getLong(0) ^ r.getLong(0)) == 2L)      // y occupies odd bits
  }

  test("graft_shingles: fewer tokens than n yields empty set; duplicates collapse") {
    val short = one("size(graft_shingles(array('a', 'b'), 3))")
    assert(short.getInt(0) == 0)
    val dup = one("size(graft_shingles(array('a', 'b', 'c', 'a', 'b', 'c', 'a', 'b', 'c'), 3))")
    // windows: abc bca cab abc bca cab abc — 3 distinct
    assert(dup.getInt(0) == 3)
  }

  test("anyShingleIn agrees with the graft_shingles expression (property)") {
    // the streaming decontamination premise: the JVM-side membership kernel
    // and the Catalyst expression produce the same shingle hashes for any
    // token sequence — including repeats, unicode, and empty tokens
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val vocab = Vector("the", "a", "b", "tok1", "tok2", "", "naïve", "日本", "x y")
    for (trial <- 0 until 20) {
      val n = 1 + rng.nextInt(4)
      val toks = Array.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.length)))
      val exprHashes = Seq(toks.toSeq).toDF("t")
        .selectExpr(s"graft_shingles(t, $n) AS h")
        .collect()(0).getSeq[Long](0).toSet
      // membership via the JVM kernel must match set-intersection via the
      // expression, probing each expression hash plus a known non-member
      val sortedAll = exprHashes.toArray.sorted
      if (toks.length >= n) {
        assert(graft.functions.ShingleHashes.anyShingleIn(toks, n, sortedAll)
          == exprHashes.nonEmpty, s"trial $trial: full-set membership")
        for (h <- exprHashes.take(3))
          assert(graft.functions.ShingleHashes.anyShingleIn(toks, n, Array(h)),
            s"trial $trial: expression hash $h not found by the kernel")
      }
      assert(!graft.functions.ShingleHashes.anyShingleIn(
        toks, n, Array(0xdeadbeefL)), s"trial $trial: phantom member")
    }
  }

  test("graft_lcs: hand cases, empty arrays, null semantics") {
    assert(one("graft_lcs(array('a','b','c'), array('a','b','c'))").getLong(0) == 3L)
    assert(one("graft_lcs(array('a','x','b','y','c'), array('a','b','c'))").getLong(0) == 3L)
    assert(one("graft_lcs(array('x','y'), array('a','b'))").getLong(0) == 0L)
    assert(one("graft_lcs(CAST(array() AS ARRAY<STRING>), array('a'))").getLong(0) == 0L)
    assert(one("graft_lcs(array('a'), CAST(array() AS ARRAY<STRING>))").getLong(0) == 0L)
    // null ARRAY → NULL (null-intolerant); null ELEMENT never matches
    assert(one("graft_lcs(CAST(NULL AS ARRAY<STRING>), array('a'))").isNullAt(0))
    assert(one("graft_lcs(array('a', CAST(NULL AS STRING), 'b'), " +
      "array('a', CAST(NULL AS STRING), 'b'))").getLong(0) == 2L)
  }

  test("graft_lcs agrees with the declarative prefix-max HOF form (property)") {
    // the q173 migration premise: the native two-row DP and the old
    // prefix-max HOF formulation compute the identical LCS length for any
    // token pair — including repeats and empty/unicode tokens
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val hof =
      """element_at(
           aggregate(c,
             transform(sequence(0, size(r)), x -> 0L),
             (row, ci) -> transform(sequence(0, size(r)), j ->
               CASE WHEN j = 0 THEN 0L ELSE
                 greatest(element_at(row, j + 1),
                   aggregate(sequence(1, j), 0L, (mx, k) ->
                     CASE WHEN element_at(r, k) = ci
                            AND element_at(row, k) + 1L > mx
                          THEN element_at(row, k) + 1L ELSE mx END))
               END)),
           size(r) + 1)"""
    val rng = new scala.util.Random(29)
    val vocab = Vector("a", "b", "c", "d", "", "naïve", "日本")
    val pairs = Seq.fill(40)((
      Seq.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.length))),
      Seq.fill(1 + rng.nextInt(12))(vocab(rng.nextInt(vocab.length)))))
    val rows = pairs.toDF("c", "r")
      .selectExpr("graft_lcs(c, r) AS native", s"$hof AS hof")
      .collect()
    rows.zip(pairs).foreach { case (row, p) =>
      assert(row.getLong(0) == row.getLong(1), s"mismatch on $p: $row")
    }
  }

  // the HOF chain graft_int8 replaced (quantizeInt8Report round <= 14):
  // same IEEE sequence, so the native results must be bit-identical
  private val int8HofSum =
    """aggregate(transform(v, x ->
         CASE WHEN array_max(transform(v, y -> abs(cast(y as double)))) = 0.0D THEN 0L
              ELSE cast(floor(cast(x as double) * 127.0D /
                     array_max(transform(v, y -> abs(cast(y as double)))) + 0.5D) as bigint) END),
         0L, (a, c) -> a + c)"""
  private val int8HofSat =
    """aggregate(transform(v, x ->
         CASE WHEN array_max(transform(v, y -> abs(cast(y as double)))) = 0.0D THEN 0L
              ELSE cast(floor(cast(x as double) * 127.0D /
                     array_max(transform(v, y -> abs(cast(y as double)))) + 0.5D) as bigint) END),
         0L, (a, c) -> a + CASE WHEN abs(c) = 127L THEN 1L ELSE 0L END)"""

  test("graft_int8 matches the HOF chain it replaced on random float vectors") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rng = new scala.util.Random(31)
    val vecs = Seq.fill(200)(Array.fill(1 + rng.nextInt(16))(
      ((rng.nextDouble() - 0.5) * 20.0).toFloat)) :+
      Array.fill(8)(0.0f) :+ Array.empty[Float]
    val rows = vecs.toDF("v")
      .selectExpr("graft_int8(v, 0) AS ns", s"$int8HofSum AS hs",
        "graft_int8(v, 1) AS nc", s"$int8HofSat AS hc")
      .collect()
    rows.zip(vecs).foreach { case (r, v) =>
      assert(r.getLong(0) == r.getLong(1) && r.getLong(2) == r.getLong(3),
        s"mismatch on ${v.toSeq}: $r")
    }
  }

  test("graft_int8: empty array folds to 0, zero vector codes to 0") {
    assert(one("graft_int8(CAST(array() AS ARRAY<FLOAT>), 0)").getLong(0) == 0L)
    assert(one("graft_int8(CAST(array() AS ARRAY<FLOAT>), 1)").getLong(0) == 0L)
    assert(one("graft_int8(array(0.0F, 0.0F), 0)").getLong(0) == 0L)
    assert(one("graft_int8(array(0.0F, 0.0F), 1)").getLong(0) == 0L)
  }

  test("graft_int8: null array is NULL; null element nulls the sum but not the sat count") {
    assert(one("graft_int8(CAST(NULL AS ARRAY<FLOAT>), 0)").isNullAt(0))
    // HOF parity: sum propagates null (acc + NULL), sat's CASE skips it
    assert(one("graft_int8(array(1.0F, CAST(NULL AS FLOAT)), 0)").isNullAt(0))
    assert(one("graft_int8(array(1.0F, CAST(NULL AS FLOAT)), 1)").getLong(0) == 1L)
  }

  test("graft_int8: interpreted eval agrees with codegen") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val vecs = Seq(Array(1.0f, -2.0f, 4.0f), Array(-3.0f, 3.0f, 1.5f))
    val df = vecs.toDF("v")
    val gen = df.selectExpr("graft_int8(v, 0)", "graft_int8(v, 1)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val interp = vecs.map { v =>
      val e = graft.functions.Int8RowStat(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          v, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)), 0)
      val s = graft.functions.Int8RowStat(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          v, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)), 1)
      (e.eval(null).asInstanceOf[Long], s.eval(null).asInstanceOf[Long])
    }
    assert(gen.toSeq == interp, s"codegen $gen vs interpreted $interp")
    // the q103 worked example: (1,-2,4) -> 32, -63, 127; (-3,3,1.5) -> -127, 127, 64
    assert(interp == Seq((96L, 1L), (64L, 2L)))
  }
}
