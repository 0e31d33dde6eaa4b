package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Scale shape: the token explode filters to QUERY TERMS before any
  * shuffle (work ∝ matching tokens, not corpus tokens); document length
  * and corpus totals are one partial-aggregated pass; query terms and
  * per-term df/idf are broadcast-sized. The top-k window partitions by
  * query over only the docs containing at least one term. At index
  * scale, the (term → doc, tf) frame is exactly the posting-list
  * artifact a persisted inverted index would store — the same
  * build/probe split as [[Dedup.buildMinhashIndex]] applies when queries
  * outnumber corpus passes.
  */
object Search {

  /** Top-`k` documents per query by rational-idf BM25.
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
    val toks = docs
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("tk"))
      .select($"doc_id", $"tk", size($"tk").as("dl"))

    // corpus statistics: one aggregation; N and avgdl broadcast as a
    // 1-row frame (a literal would bake plan-compile-time values)
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum($"dl".cast("long")).as("total_tokens"))

    val allTerms = queries.flatMap(_._2).distinct
    val termFrame = queries
      .flatMap { case (q, ts) => ts.map(tt => (q, tt)) }
      .toDF("query_id", "term")

    // per-(doc, term) tf — the explode filters to query terms FIRST
    val tf = toks.select($"doc_id", $"dl", explode($"tk").as("term"))
      .filter($"term".isin(allTerms: _*))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).as("tf"))

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
