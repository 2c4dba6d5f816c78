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

  test("graft_int8: zero max with a null element is 0, not NULL (HOF CASE fires first)") {
    // the round-15 advisor corner: `CASE WHEN ma = 0.0 THEN 0L` never
    // reads the element, so a null element still codes to 0L — assert
    // against the literal HOF chain, not just the expected constant
    assert(one("graft_int8(array(0.0F, CAST(NULL AS FLOAT)), 0)").getLong(0) == 0L)
    assert(one("graft_int8(array(0.0F, CAST(NULL AS FLOAT)), 1)").getLong(0) == 0L)
    val hof = spark.sql(
      s"SELECT $int8HofSum AS hs, $int8HofSat AS hc FROM " +
        "(SELECT array(0.0F, CAST(NULL AS FLOAT)) AS v)").collect()(0)
    assert(hof.getLong(0) == 0L && hof.getLong(1) == 0L)
    // all-null vector: ma itself is NULL -> sum NULL, sat 0 (unchanged)
    assert(one("graft_int8(array(CAST(NULL AS FLOAT)), 0)").isNullAt(0))
    assert(one("graft_int8(array(CAST(NULL AS FLOAT)), 1)").getLong(0) == 0L)
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

  // the HOF chain graft_entropy replaced (charEntropy round <= 15): same
  // sorted-char run-length fold, same round-9/round-6 stream — results
  // must be bit-identical on arbitrary unicode text
  private def entropyHof(txt: String): (Long, Double) = {
    val r = spark.sql(
      s"""SELECT size(bd) AS nd,
            CASE WHEN size(bd) < 1 THEN 0.0D ELSE
              round(-aggregate(
                transform(sequence(1, size(bd)), j ->
                  coalesce(try_element_at(bd, j + 1), size(sc) + 1) - element_at(bd, j)),
                CAST(0.0 AS DOUBLE), (a, x) -> a +
                  round((CAST(x AS DOUBLE) / length(text)) *
                        ln(CAST(x AS DOUBLE) / length(text)), 9)), 6) END AS e
          FROM (SELECT text, sc,
            CASE WHEN size(sc) < 1 THEN CAST(array() AS ARRAY<INT>) ELSE
              filter(sequence(1, size(sc)),
                i -> i = 1 OR element_at(sc, i) <> element_at(sc, i - 1)) END AS bd
          FROM (SELECT text,
            CASE WHEN length(text) < 1 THEN CAST(array() AS ARRAY<STRING>) ELSE
              array_sort(transform(sequence(1, length(text)),
                i -> substring(text, i, 1))) END AS sc
          FROM (SELECT '${txt.replace("'", "''")}' AS text)))""").collect()(0)
    (r.getInt(0).toLong, r.getDouble(1))
  }

  test("graft_entropy matches the HOF chain it replaced on random unicode strings") {
    graft.functions.GraftFunctions.register(spark)
    val rng = new scala.util.Random(37)
    val alphabet = "ab c.!xyzéß日本語0;—"
    val texts = Seq.fill(60)(
      Seq.fill(rng.nextInt(40))(alphabet(rng.nextInt(alphabet.length))).mkString) ++
      Seq("", "a", "aaaa", "ab", "日本日本語", "a b a b .")
    texts.foreach { t =>
      val r = one(s"graft_entropy('${t.replace("'", "''")}')")
      val st = r.getStruct(0)
      val (nd, e) = entropyHof(t)
      assert(st.getLong(0) == nd && st.getDouble(1) == e,
        s"entropy mismatch on '$t': native=(${st.getLong(0)},${st.getDouble(1)}) hof=($nd,$e)")
    }
  }

  test("graft_entropy: null is NULL; worked example") {
    assert(one("graft_entropy(CAST(NULL AS STRING))").isNullAt(0))
    // "aab": p=[2/3,1/3]; -sum(round9(p ln p)) = 0.636514 after round6
    val st = one("graft_entropy('aab')").getStruct(0)
    assert(st.getLong(0) == 2L && st.getDouble(1) == 0.636514, s"got $st")
  }

  // the HOF hash graft_hash31 replaced (dsirWeights / featureHashReport
  // round <= 15): the exact (acc*31 + ascii) % mod fold
  private def hash31Hof(w: String, mod: Int): Long =
    spark.sql(
      s"SELECT aggregate(transform(sequence(1, length(w)), " +
        s"j -> ascii(substring(w, j, 1))), 0L, " +
        s"(acc, c) -> (acc * 31L + c) % $mod) AS h " +
        s"FROM (SELECT '${w.replace("'", "''")}' AS w)").collect()(0).getLong(0)

  test("graft_hash31 matches the HOF fold on random unicode tokens") {
    graft.functions.GraftFunctions.register(spark)
    val rng = new scala.util.Random(41)
    val alphabet = "abcdefgé日▲z019"
    val words = Seq.fill(50)(
      Seq.fill(1 + rng.nextInt(12))(alphabet(rng.nextInt(alphabet.length))).mkString) ++
      Seq("", "a", "the quick brown fox")
    for (w <- words; mod <- Seq(64, 10000, 1 << 20)) {
      val n = one(s"graft_hash31('${w.replace("'", "''")}', $mod)").getLong(0)
      val h = hash31Hof(w, mod)
      assert(n == h, s"hash31 mismatch on '$w' mod $mod: native=$n hof=$h")
    }
  }

  test("graft_feats31 matches the HOF unigram+bigram feature multiset") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val mod = 10000
    def hashExpr(s: String): String =
      s"aggregate(transform(sequence(1, length($s)), j -> ascii(substring($s, j, 1))), " +
        s"0L, (acc, c) -> (acc * 31L + c) % $mod)"
    val hof =
      s"concat(transform(t, w -> ${hashExpr("w")}), " +
        s"CASE WHEN size(t) >= 2 THEN transform(sequence(2, size(t)), i -> " +
        s"${hashExpr("concat(element_at(t, i - 1), ' ', element_at(t, i))")}) " +
        "ELSE CAST(array() AS array<bigint>) END)"
    val rng = new scala.util.Random(43)
    val vocab = Vector("a", "bb", "ccc", "naïve", "日本", "x9", "")
    val rows = (Seq.fill(40)(
      Seq.fill(1 + rng.nextInt(8))(vocab(rng.nextInt(vocab.length)))) :+ Seq("lone"))
      .toDF("t")
      .selectExpr(s"graft_feats31(t, $mod) AS native", s"$hof AS hof")
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"feats31 mismatch: native=${r.getSeq[Long](0)} hof=${r.getSeq[Long](1)}")
    }
  }

  test("graft_bleu matches the declarative (doc, n, gram) clip on random pairs") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rng = new scala.util.Random(53)
    val vocab = Vector("a", "b", "c", "dd", "é日")
    val docs = (Seq.fill(40)((
      Seq.fill(rng.nextInt(14))(vocab(rng.nextInt(vocab.length))),
      Seq.fill(rng.nextInt(14))(vocab(rng.nextInt(vocab.length))))) ++
      Seq((Seq.empty[String], Seq("a")), (Seq("a", "a", "a"), Seq("a"))))
      .zipWithIndex.map { case ((c, r), i) => (i.toLong, c, r) }
    val df = docs.toDF("id", "c", "r")
    val native = df.selectExpr("id", "explode(graft_bleu(c, r, 4)) AS st")
      .selectExpr("id", "st.n AS n", "st.m AS m", "st.tot AS tot")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // declarative clip: per (id, n, g), min(candidate count, ref count)
    val cg = df.selectExpr("id", "explode(graft_ngrams(c, 4)) AS ng")
      .selectExpr("id", "ng.n AS n", "ng.g AS g")
      .groupBy("id", "n", "g").count()
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)) -> r.getLong(3)).toMap
    val rg = df.selectExpr("id", "explode(graft_ngrams(r, 4)) AS ng")
      .selectExpr("id", "ng.n AS n", "ng.g AS g")
      .groupBy("id", "n", "g").count()
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)) -> r.getLong(3)).toMap
    docs.foreach { case (id, c, _) =>
      (1 to 4).foreach { n =>
        val grams = cg.collect { case ((i, o, g), cnt) if i == id && o == n => (g, cnt) }
        val m = grams.map { case (g, cnt) => math.min(cnt, rg.getOrElse((id, n, g), 0L)) }.sum
        val tot = math.max(0, c.length - n + 1).toLong
        assert(native((id, n)) == ((m, tot)),
          s"bleu clip mismatch doc $id n=$n: native=${native((id, n))} want=($m,$tot)")
      }
    }
  }

  test("graft_ngrams matches the per-order slice/join emission") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rng = new scala.util.Random(47)
    val vocab = Vector("a", "bb", "ccc", "dd", "é日")
    val docs = (Seq.fill(30)(
      Seq.fill(rng.nextInt(9))(vocab(rng.nextInt(vocab.length)))) ++
      Seq(Seq.empty[String], Seq("solo")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val native = docs.toDF("id", "t")
      .selectExpr("id", "explode(graft_ngrams(t, 4)) AS ng")
      .selectExpr("id", "ng.n AS n", "ng.g AS g")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val hof = docs.toDF("id", "t")
      .selectExpr("id", "t", "explode(array(1, 2, 3, 4)) AS n")
      .filter("size(t) >= n")
      .selectExpr("id", "n",
        "explode(transform(sequence(1, size(t) - n + 1), " +
          "i -> array_join(slice(t, i, n), ' '))) AS g")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(native == hof, s"ngram multiset mismatch")
  }

  test("gopherRep kernel: parity with an independent reference on edge corpora") {
    import org.apache.spark.unsafe.types.UTF8String
    // independent reimplementation in idiomatic collections — shares no
    // code shape with the kernel's primitive loops
    def ref(text: String): Seq[Long] = {
      def cp(x: String) = x.codePointCount(0, x.length).toLong
      val lines = text.split("\n", -1).toSeq
      val toks = text.split("\\s+", -1).toSeq.filter(_.nonEmpty)
      def grams(n: Int) =
        toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toVector
      def top(n: Int): Long = {
        val g = grams(n)
        if (g.isEmpty) 0L else {
          val cnt = g.groupBy(identity).view.mapValues(_.size.toLong).toMap
          // test corpora keep count ties between ASCII n-grams only, so
          // String order here equals the kernel's UTF8-binary order
          val (ng, c) = cnt.toSeq.minBy { case (s, c0) => (-c0, s) }
          c * (cp(ng) - (n - 1))
        }
      }
      def dup(n: Int): Long = {
        val g = grams(n)
        if (g.isEmpty) 0L else {
          val cnt = g.groupBy(identity).view.mapValues(_.size).toMap
          g.zipWithIndex.collect { case (ng, i) if cnt(ng) >= 2 => i until i + n }
            .flatten.toSet.toSeq.map((p: Int) => cp(toks(p))).sum
        }
      }
      Seq(lines.size.toLong, (lines.size - lines.distinct.size).toLong,
        lines.groupBy(identity).map { case (l, o) => (o.size - 1) * cp(l) }.sum,
        lines.map(cp).sum, toks.map(cp).sum, top(2), top(3), top(4)) ++
        (5 to 10).map(dup)
    }
    val cases = Seq(
      "", " ", "\n\n", "a",
      "héllo wörld héllo wörld héllo wörld x y z",
      "a b c a b c a b c x",
      "tab\tsep  multi   space\r\nline mix line mix line mix end",
      ("w1 w2 w3 w4 w5 " * 4) + "tail",
      "x\ny\nx\nzz\n\n\n",
      "😀 emoji 😀 emoji 😀 emoji p1 p2 p3 p4 p5 p6")
    for (c <- cases) {
      val got = graft.functions.TextKernels.gopherRep(UTF8String.fromString(c))
      val want = ref(c)
      (0 until 14).foreach(i => assert(got.getLong(i) == want(i),
        s"field $i of '${c.take(30)}': got ${got.getLong(i)} want ${want(i)}"))
    }
  }
}
