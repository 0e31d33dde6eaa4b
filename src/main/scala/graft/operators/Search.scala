package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.tokens

/** Keyword relevance search over a document corpus — the retrieval side
  * of a training-data pipeline (nearest-neighbor text retrieval for
  * decontamination audits, boilerplate hunting, targeted corpus slices).
  *
  * Scoring is BM25-SHAPED with a RATIONAL idf: the classic
  * `ln((N - df + 0.5) / (df + 0.5))` is replaced by the odds ratio
  * itself (its argument), because `ln` is not bit-reproducible across
  * engines (libm last-ulp differences) while the odds ratio is one IEEE
  * division of exactly-representable operands. Per term the transform is
  * monotone, so single-term rankings are identical to BM25's; multi-term
  * sums weight rare terms more sharply than the log form. All constants
  * (k1 = 1.25, b = 0.75) are exact in binary, every intermediate is a
  * single IEEE op in a fixed evaluation order, and per-term scores cross
  * engines through DECIMAL(18, 9) — the repo's oracle-determinism rules.
  *
  * Two entry points share one scoring plan ([[scoreAndRank]], so the
  * floats are identical by construction):
  *
  *  - [[bm25TopK]] — ad-hoc over document text: the token explode
  *    filters to QUERY TERMS before any shuffle (work ∝ matching tokens,
  *    not corpus tokens); document length and corpus totals are one
  *    partial-aggregated pass; per-term df/idf are broadcast-sized.
  *  - [[buildPostingsIndex]] / [[bm25TopKIndexed]] — the 100 TB shape:
  *    the inverted index `(term, doc_id, tf, dl)` plus per-batch stats
  *    partials persist as Delta tables (term-sorted files, so the probe's
  *    term filter prunes by per-file min/max stats); a probe reads ONLY
  *    the artifact, never the corpus — the same build/probe split as
  *    [[Dedup.buildMinhashIndex]]. [[appendToPostingsIndex]] adds a new
  *    batch's postings in SetTransaction-idempotent commits without
  *    touching indexed documents.
  */
object Search {

  /** Top-`k` documents per query by rational-idf BM25 over raw text.
    *
    * One call tokenizes the corpus ONCE: a single pass projects each
    * document to `(doc_id, dl, matched query terms)` — the full token
    * array never leaves the projection — and that doc-count-sized frame
    * is persisted scope-locally to feed both the corpus-stats aggregation
    * and the tf/df scoring (the r8 design re-tokenized up to three times;
    * at a corpus that outgrows the page cache those were three real
    * passes per query batch). The result is only `|queries| * k` rows, so
    * it is materialized eagerly and returned as a local relation — the
    * cache releases before the call returns instead of leaking past it.
    * This is the AD-HOC face: anything issuing repeated queries should
    * build the postings artifact once and serve them via
    * [[bm25TopKIndexed]], which scans only term-pruned postings files.
    *
    * @param queries (query_id, terms) — terms should be pre-lowercased
    * @return (query_id, rank, doc_id, score) — rank 1-based by
    *         (score DESC, doc_id ASC), score the DECIMAL(18,9) per-term
    *         sum as DOUBLE
    */
  def bm25TopK(spark: SparkSession, docs: DataFrame, idCol: String,
               textCol: String, queries: Seq[(String, Seq[String])],
               k: Int = 5, k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty && k > 0)
    val allTerms = queries.flatMap(_._2).distinct
    // per-doc projection cached for the pass-sharing: ~tens of bytes per
    // document (id, length, the few matched terms), NOT the token arrays
    // — cacheable at any corpus scale, which is what made the r8 measured
    // persist rule reject caching in the first place
    val perDoc = tokenized(docs, idCol, textCol)
      .select($"doc_id", $"dl",
        filter($"tk", t => t.isin(allTerms: _*)).as("mtk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = perDoc.agg(count(lit(1)).as("n_docs"),
        sum($"dl".cast("long")).as("total_tokens"))
      val tf = perDoc.select($"doc_id", $"dl", explode($"mtk").as("term"))
        .groupBy($"doc_id", $"dl", $"term")
        .agg(count(lit(1)).as("tf"))
      val ranked = scoreAndRank(spark, tf, stats, queries, k, k1, b)
      val rows = ranked.collect() // bounded: |queries| * k
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), ranked.schema)
    } finally perDoc.unpersist(blocking = false)
  }

  /** Build the persisted inverted-index artifact: `<path>/postings` =
    * (term, doc_id, tf, dl) in term-sorted files, `<path>/stats` =
    * per-batch (n_docs, total_tokens) partials (summed at probe time —
    * batch-count rows, never corpus-sized). */
  def buildPostingsIndex(spark: SparkSession, docs: DataFrame, idCol: String,
                         textCol: String, indexPath: String,
                         configuration: Map[String, String] =
                           DefaultPostingsConfig): Unit =
    writePostings(spark, docs, idCol, textCol, indexPath,
      SaveMode.Overwrite, idempotentTxn = None, configuration)

  /** Append a NEW batch's postings to an existing artifact — indexed
    * documents are never re-read or re-tokenized; doc_ids must be new
    * (the same contract as [[Dedup.incrementalMinhashLshPersisted]]). */
  def appendToPostingsIndex(spark: SparkSession, batch: DataFrame,
                            idCol: String, textCol: String, indexPath: String,
                            idempotentTxn: Option[(String, Long)] = None,
                            configuration: Map[String, String] =
                              DefaultPostingsConfig): Unit =
    writePostings(spark, batch, idCol, textCol, indexPath,
      SaveMode.Append, idempotentTxn, configuration)

  /** The artifact DEFAULT (same decision as the substring index, r9):
    * per-batch appends accrete small files, so the table self-compacts
    * unless the caller opts out (churn specs do, to expose and then
    * recover the degradation). */
  val DefaultPostingsConfig: Map[String, String] =
    Map("delta.autoOptimize.autoCompact" -> "true")

  private def writePostings(spark: SparkSession, docs: DataFrame,
                            idCol: String, textCol: String, indexPath: String,
                            mode: SaveMode,
                            idempotentTxn: Option[(String, Long)],
                            configuration: Map[String, String]): Unit = {
    import spark.implicits._
    val toks = tokenized(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val postings = toks
        .select($"doc_id", $"dl", explode($"tk").as("term"))
        .groupBy($"doc_id", $"dl", $"term")
        .agg(count(lit(1)).as("tf"))
        // term-local files: the probe's term filter then skips whole
        // files on parquet/AddFile min-max stats
        .repartition(col("term")).sortWithinPartitions("term")
      // a growing artifact needs a compaction story: per-batch appends
      // accrete small files, so the table self-compacts by default (same
      // pattern as the LSH index artifact; see [[DefaultPostingsConfig]])
      graft.delta.DeltaTable.write(postings, s"$indexPath/postings", mode,
        configuration = configuration, idempotentTxn = idempotentTxn)
      val stats = toks.agg(count(lit(1)).as("n_docs"),
        sum($"dl".cast("long")).as("total_tokens"))
      graft.delta.DeltaTable.write(stats, s"$indexPath/stats", mode,
        configuration = configuration,
        idempotentTxn = idempotentTxn.map { case (app, v) => (s"$app-stats", v) })
    } finally toks.unpersist(blocking = false)
  }

  /** Top-`k` per query served from the PERSISTED artifact — reads only
    * `<path>/postings` (term-filtered) and the stats partials. Produces
    * bit-identical results to [[bm25TopK]] over the same corpus (shared
    * scoring plan). */
  def bm25TopKIndexed(spark: SparkSession, indexPath: String,
                      queries: Seq[(String, Seq[String])],
                      k: Int = 5, k1: Double = 1.25,
                      b: Double = 0.75): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty && k > 0)
    val allTerms = queries.flatMap(_._2).distinct
    val tf = graft.delta.DeltaTable.forPath(spark, s"$indexPath/postings")
      .toDF.filter($"term".isin(allTerms: _*))
      .select($"doc_id", $"dl", $"term", $"tf")
    val stats = graft.delta.DeltaTable.forPath(spark, s"$indexPath/stats")
      .toDF.agg(sum($"n_docs").as("n_docs"),
        sum($"total_tokens").as("total_tokens"))
    scoreAndRank(spark, tf, stats, queries, k, k1, b)
  }

  /** Reciprocal-rank fusion of several ranked retrieval runs — the
    * standard way to combine a keyword run ([[bm25TopK]]) with a vector
    * run ([[graft.operators.Similarity.bruteForceTopK]]) without
    * commensurable scores: each run contributes `1 / (rrfK + rank)` per
    * (query, doc) and the fused ranking orders by the contribution sum
    * (Cormack et al., SIGIR 2009).
    *
    * The contribution is computed in SCALED INTEGER form —
    * `1e9 DIV (rrfK + rank)` — so the per-run terms and their sum are
    * exact BIGINT arithmetic: no float summation order, no decimal
    * rounding mode, bit-identical across engines by construction (the
    * repo's oracle-determinism rules). At scale 1e9 distinct ranks map
    * to distinct contributions for any practical `rrfK`/depth; residual
    * score ties break by doc_id.
    *
    * Scale shape: every input is already a top-depth-per-query frame
    * (|queries| × depth rows — the heavy corpus work happened inside the
    * retrievers), so the union + one aggregation here is trivially small
    * at any corpus size.
    *
    * @param runs each (query_id, doc_id, rank) with rank 1-based; extra
    *             columns are ignored
    * @return (query_id, rank, doc_id, rrf_score) — `rrf_score` the exact
    *         BIGINT sum of `1e9 DIV (rrfK + rank_i)` over the runs that
    *         retrieved the doc; rank 1-based by (rrf_score DESC, doc_id)
    */
  def rrfFuse(runs: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(runs.nonEmpty && k > 0 && rrfK >= 0)
    val contribs = runs.map { r =>
      r.select(col("query_id"), col("doc_id"),
        expr(s"1000000000L DIV (${rrfK}L + CAST(rank AS LONG))").as("c"))
    }.reduce(_ unionAll _)
    val fused = contribs.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("rrf_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_score"))
  }

  private def tokenized(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        tokens(lower(col(textCol))).as("tk"))
      .select(col("doc_id"), col("tk"), size(col("tk")).as("dl"))

  /** The one scoring + ranking plan both faces share: `tf` is
    * (doc_id, dl, term, tf) restricted to query terms; `stats` one row
    * (n_docs, total_tokens). */
  private def scoreAndRank(spark: SparkSession, tf: DataFrame,
                           stats: DataFrame,
                           queries: Seq[(String, Seq[String])], k: Int,
                           k1: Double, b: Double): DataFrame = {
    import spark.implicits._
    val termFrame = queries
      .flatMap { case (q, ts) => ts.map(tt => (q, tt)) }
      .toDF("query_id", "term")
    val df = tf.groupBy($"term").agg(countDistinct($"doc_id").as("df"))
    val perTerm = tf
      .join(broadcast(df), Seq("term"))
      .join(broadcast(termFrame), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        $"total_tokens".cast("double") / $"n_docs".cast("double"))
      // parenthesization mirrored verbatim in the DuckDB oracles — each
      // step is one IEEE op, deterministic cross-engine
      .withColumn("idf_r",
        ($"n_docs".cast("double") - $"df".cast("double") + lit(0.5)) /
          ($"df".cast("double") + lit(0.5)))
      .withColumn("denom",
        $"tf".cast("double") +
          lit(k1) * (lit(1.0) - lit(b) + lit(b) * ($"dl".cast("double") / $"avgdl")))
      .withColumn("contrib",
        ($"idf_r" * ($"tf".cast("double") * lit(k1 + 1.0)) / $"denom")
          .cast(DecimalType(18, 9)))
    val scored = perTerm.groupBy($"query_id", $"doc_id")
      .agg(sum($"contrib").as("score_dec"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"score_dec".desc, $"doc_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"doc_id",
        $"score_dec".cast("double").as("score"))
  }
}
