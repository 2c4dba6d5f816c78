package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** End-to-end training-data preparation pipeline composed from the
  * operator library: quality filter → exact dedup → near-dup removal →
  * chunking → sequence packing. One declarative flow; every stage is the
  * oracle-verified operator from its module, so the pipeline inherits the
  * correctness gate. The near-dup stage keeps each component's canonical
  * document (min doc_id) and drops the rest — the LSH candidate set from
  * Text.qMinHashLsh bounds the work at scale.
  */
object Pipeline {

  final case class Config(
      minTokens: Int = 10,
      maxStopRatio: Double = 0.5,
      jaccardThreshold: Double = 0.5,
      chunkSize: Int = 32,
      chunkStride: Int = 24,
      packBudget: Int = 8192)

  /** ONE tokenized scan of `documents` feeds every pipeline stage: the
    * quality gate, the exact-dedup hash, the LSH shingles and the summary's
    * per-language totals all read this cached frame (InMemoryTableScan)
    * instead of each re-scanning the parquet and re-running split().
    * Lazy persist (LRU-evictable, spills to disk) rather than an eager
    * checkpoint: at 100 TB caching the tokenized corpus for the pipeline's
    * scope is the standard multi-stage trade. Calling this twice for the
    * same dir reuses the same cache entry (identical plan); registered
    * with InternalCaches so the session's batch owner can release it. */
  private[graft] def tokenizedDocs(s: SparkSession, dir: String): DataFrame =
    graft.core.InternalCaches.persist(
      Tables.documents(s, dir).withColumn("t", split(col("text"), " ")))

  /** Documents surviving quality + exact-dup + near-dup filtering. */
  def cleanCorpus(s: SparkSession, dir: String, cfg: Config = Config()): DataFrame =
    cleanCorpusFrom(tokenizedDocs(s, dir), cfg)

  private def cleanCorpusFrom(docs: DataFrame, cfg: Config): DataFrame = {
    // stage 1: quality gate (token count + stopword ratio)
    val stopList = Seq("the", "a", "and", "of", "to", "in", "is", "it")
      .map(w => s"'$w'").mkString(", ")
    val quality = docs
      .withColumn("n_tok", size(col("t")))
      .withColumn("n_stop", expr(s"size(filter(t, x -> x IN ($stopList)))"))
      .filter(col("n_tok") >= cfg.minTokens &&
              col("n_stop").cast(DoubleType) / col("n_tok") <= cfg.maxStopRatio)
    // stage 2: exact dedup — canonical (min doc_id) per content hash, as a
    // row_number window over a hash column computed ONCE per document. The
    // previous agg+self-join shape re-evaluated md5(text) in the join
    // predicate — twice the hashing over what is by definition the full
    // corpus. One shuffle on h either way; the window avoids the join.
    val hw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id").asc)
    val exactDeduped = quality
      .withColumn("h", md5(col("text")))
      .withColumn("_rn", row_number().over(hw))
      .filter(col("_rn") === 1)
      .drop("h", "_rn")
    // stage 3: near-dup removal — drop every non-canonical member of a
    // Jaccard component (pairs from the LSH path over the SAME cached
    // tokenized frame; d1 < d2 ⇒ min survives)
    val nearDupLosers = Text.minHashLshPairs(docs)
      .filter(col("jaccard") >= cfg.jaccardThreshold)
      .select(col("d2").as("drop_id")).distinct()
    exactDeduped
      .join(nearDupLosers, col("doc_id") === col("drop_id"), "left_anti")
  }

  /** Full pipeline: cleaned corpus → overlapping chunks → packed bins.
    * Output: one row per chunk with its training-bin assignment. */
  def trainingChunks(s: SparkSession, dir: String, cfg: Config = Config()): DataFrame =
    trainingChunksFrom(tokenizedDocs(s, dir), cfg)

  private def trainingChunksFrom(docs: DataFrame, cfg: Config): DataFrame = {
    val clean = cleanCorpusFrom(docs, cfg)
    // the chunk hash is taken HERE so the token arrays never leave this
    // projection: the prefix sum below materializes its input once, and a
    // scalars-only frame (ids, lengths, hash) keeps that write small
    val chunks = clean
      .select(col("doc_id"), col("lang"), col("t"),
        posexplode(expr(s"sequence(0, cast(floor((size(t) - 1) / ${cfg.chunkStride}.0) as int))")))
      .select(col("doc_id"), col("lang"), col("pos").as("chunk_idx"),
        expr(s"slice(t, pos * ${cfg.chunkStride} + 1, ${cfg.chunkSize})").as("chunk"))
      .select(col("doc_id"), col("lang"), col("chunk_idx"),
        size(col("chunk")).as("chunk_len"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
    // running total via the two-level prefix sum (Text.distributedRunningSum):
    // a plain partitionBy(lang) window would hand each language's entire
    // chunk stream to a single reducer
    Text.distributedRunningSum(chunks, "lang", Seq("doc_id", "chunk_idx"),
        "chunk_len", "running")
      .withColumn("bin", floor((col("running") - col("chunk_len")) / cfg.packBudget.toDouble).cast(LongType))
      .select(col("doc_id"), col("lang"), col("chunk_idx"), col("chunk_len"),
        col("bin"), col("chunk_hash"))
  }

  /** Gate query: per-language pipeline yield summary (docs in, docs kept,
    * chunks, bins) — deterministic, rows-only (the composed flow includes
    * the LSH stage which has no SQL oracle). */
  def qPipelineSummary(s: SparkSession, dir: String): DataFrame =
    summaryFrom(tokenizedDocs(s, dir))

  /** Pipeline yield summary over ANY (doc_id, text, lang, …) corpus frame:
    * the gate runs it on the documents table (via the shared tokenized
    * cache); the Bench 1M-doc anchor runs it on the SyntheticDocs corpus,
    * whose per-language goldens are exact by construction. The caller owns
    * tokenization caching — pass a frame whose `t` column exists, or use
    * [[summaryOver]] to tokenize + register with InternalCaches. */
  def summaryOver(raw: DataFrame, cfg: Config = Config()): DataFrame =
    summaryFrom(graft.core.InternalCaches.persist(
      raw.withColumn("t", split(col("text"), " "))), cfg)

  private def summaryFrom(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val total = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("docs_in"))
    val chunks = trainingChunksFrom(docs, cfg)
    val kept = chunks.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("docs_kept"),
           count(lit(1)).as("n_chunks"),
           countDistinct(col("bin")).as("n_bins"))
    total.join(kept, "lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_pipeline_summary" -> (qPipelineSummary _),
  )

  /** The whole pipeline re-expressed in the oracle dialect: quality gate,
    * exact dedup, near-dup removal (all-pairs Jaccard — equivalent to the
    * LSH candidates on this corpus, like q35), chunking, packing, summary. */
  val oracles: Map[String, String] = Map(
    "q66_pipeline_summary" ->
      """WITH tokd AS (SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM documents),
         q AS (SELECT * FROM tokd WHERE len(t) >= 10
               AND CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE) / len(t) <= 0.5),
         ex AS (SELECT q.* FROM q
                JOIN (SELECT md5(text) AS h, min(doc_id) AS keep FROM q GROUP BY md5(text)) g
                  ON md5(q.text) = g.h AND q.doc_id = g.keep),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
                  i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS s
                FROM tokd WHERE len(t) >= 3),
         card AS (SELECT doc_id AS cid, count(*) AS n FROM sh GROUP BY doc_id),
         common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
                    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                    GROUP BY 1, 2),
         losers AS (SELECT DISTINCT d2 FROM common
                    JOIN card ca ON d1 = ca.cid JOIN card cb ON d2 = cb.cid
                    WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.5),
         clean AS (SELECT * FROM ex WHERE doc_id NOT IN (SELECT d2 FROM losers)),
         chunks AS (SELECT doc_id, lang, t,
                      unnest(range(0, CAST(floor((len(t) - 1) / 24.0) AS INT) + 1)) AS ci
                    FROM clean),
         ch2 AS (SELECT doc_id, lang, ci,
                   len(t[ci * 24 + 1 : least(ci * 24 + 32, len(t))]) AS clen
                 FROM chunks),
         packed AS (SELECT lang, doc_id, ci, clen,
                      sum(clen) OVER (PARTITION BY lang ORDER BY doc_id ASC, ci ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
                    FROM ch2),
         kept AS (SELECT lang, count(DISTINCT doc_id) AS docs_kept, count(*) AS n_chunks,
                    count(DISTINCT CAST(floor((running - clen) / 8192.0) AS BIGINT)) AS n_bins
                  FROM packed GROUP BY lang),
         tot AS (SELECT lang, count(*) AS docs_in FROM documents GROUP BY lang)
         SELECT tot.lang, docs_in, docs_kept, n_chunks, n_bins
         FROM tot JOIN kept ON tot.lang = kept.lang""",
  )
}
