package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic document corpus with planted near-duplicates —
  * ground truth by construction for the dedup path, the text analogue of
  * [[ArtificialPoints]] (which plants geometric outliers).
  *
  * Layout: `nBase` base documents of `nTok` tokens hash-drawn from a
  * `vocab`-token vocabulary (two random docs share essentially no 3-token
  * shingles at these parameters), plus `nPlant` near-dups: doc
  * `nBase + i` copies doc `i` with ONE mid-document token swapped
  * (shingle Jaccard ≈ 0.85 at nTok = 40 — above any dedup threshold worth
  * running, below exact equality). Every row is a pure function of
  * (doc_id, the parameters): partitioning-, order- and run-independent.
  */
object SyntheticDocs {

  /** Deterministic language tag: doc_id % 4 → one of four labels. Gives
    * the pipeline anchors a stratification column whose per-language
    * counts are exact by construction (ids are dense, so any id range
    * divisible by 4 splits evenly). */
  private val langs = Array("en", "de", "fr", "es")

  /** @param hotEvery 0 (default) for the uniform corpus; k > 0 plants
    *        hot-shingle SKEW — every k-th base doc (and its near-dup copy)
    *        opens with the same fixed 3-token boilerplate prefix, so 1/k of
    *        the corpus shares one hot shingle (the "© boilerplate header"
    *        shape real crawls have). The shared shingle contributes
    *        Jaccard ≈ 1/75 between unrelated hot docs — far below any
    *        dedup threshold — so the planted-pair ground truth is
    *        unchanged; what the skew stresses is the CANDIDATE layer
    *        (band buckets / prefix filters), not the answer. */
  def planted(spark: SparkSession, nBase: Long, nPlant: Long,
              nTok: Int = 40, vocab: Int = 5000, hotEvery: Int = 0): DataFrame = {
    import spark.implicits._
    require(nPlant <= nBase, s"cannot plant $nPlant near-dups into $nBase docs")
    // token j of doc `base` hashes base * 64 + j: the stride bounds nTok.
    // Past it, adjacent docs would silently share token streams and break
    // the "two random docs share essentially no shingles" premise the
    // planted-pair-count asserts (TextSpec, Bench reference_text) rely on.
    require(nTok >= 1 && nTok <= 64,
      s"nTok=$nTok outside the [1, 64] hash-stride bounds")
    require(hotEvery >= 0, s"hotEvery must be >= 0, got $hotEvery")
    // the hot prefix needs headroom: 3 fixed tokens + the mid-doc swap must
    // leave enough doc-specific shingles that hot pairs stay far below the
    // 0.5 dedup threshold (at nTok >= 8, shared <= 1 of >= 6 shingles)
    require(hotEvery == 0 || nTok >= 8,
      s"hot-skew corpora need nTok >= 8 (got $nTok)")
    def tok(h: Long): String = "t" + java.lang.Long.remainderUnsigned(h, vocab.toLong)
    spark.range(nBase + nPlant).map { jid =>
      val id: Long = jid
      val base = if (id < nBase) id else id - nBase
      val words = new Array[String](nTok)
      var j = 0
      while (j < nTok) {
        words(j) = tok(graft.functions.BitMix.splitmix64(base * 64 + j))
        j += 1
      }
      if (hotEvery > 0 && base % hotEvery == 0) {
        // fixed out-of-vocab boilerplate ("hdr*" can never collide with a
        // "t<k>" vocab token): exactly one fully-shared 3-shingle per pair
        words(0) = "hdr0"; words(1) = "hdr1"; words(2) = "hdr2"
      }
      if (id >= nBase) words(nTok / 2) = tok(graft.functions.BitMix.splitmix64(-id))
      (id, words.mkString(" "), langs((id % 4).toInt))
    }.toDF("doc_id", "text", "lang")
  }
}
