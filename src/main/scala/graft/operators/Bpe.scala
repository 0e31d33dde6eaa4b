package graft.operators

import scala.util.control.Breaks.{break, breakable}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding merge training (Sennrich et al. 2016)
  * over a corpus — the tokenizer-training primitive of an LM data
  * pipeline, in the word-dictionary formulation the fast trainers
  * (fastBPE, SentencePiece's BPE mode) use: pair statistics aggregate
  * over DISTINCT words weighted by frequency, so after one corpus-sized
  * counting pass every iteration touches only the vocabulary.
  *
  * Symbol sequences are carried as `[sym][sym]...` STRINGS and a merge
  * applies as one literal `replace('[a][b]' -> '[ab]')` — left-to-right
  * non-overlapping, the greedy semantics of the reference BPE
  * implementation, and (because each symbol is bracket-wrapped with no
  * shared boundary characters) replace() can never consume a delimiter
  * the next occurrence needs. The DuckDB oracle replays the identical
  * string algorithm, so the two engines cannot diverge on merge order.
  *
  * Scale shape: one explode + hash aggregation builds the weighted word
  * dictionary (map-side combinable; the corpus never re-scans); each of
  * the k iterations is one vocabulary-sized pair explode + one grouped
  * sum + a top-1 (TakeOrdered, never a full sort) + one projection. The
  * only driver traffic is k single-row collects — the argmax merge
  * decision, which IS the sequential dependency of the BPE objective. */
object Bpe {

  /** Train `k` merges over the lowercase alphanumeric words of `textCol`.
    * Returns (rank, left_sym, right_sym, merged, pair_count); ties on
    * pair_count break lexicographically, so the result is deterministic.
    * Stops early if the vocabulary runs out of adjacent pairs. */
  def trainMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    val words = InputWidth.widen(df)
      .select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).cast("long").as("wc"))
    // [c][h][a][r] representation; symbols are alnum so the brackets are
    // unambiguous delimiters
    var cur = words.select(col("wc"),
      concat(lit("["),
        concat_ws("][", transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))),
        lit("]")).as("s"))
    // each iteration re-reads `cur` twice (pair stats + merge apply):
    // keep the vocabulary-sized frame cached, swap per iteration
    cur.persist()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      breakable {
        for (rank <- 1 to k) {
          val syms = cur.select(col("wc"),
            split(expr("trim(BOTH '[]' FROM s)"), "\\]\\[").as("l"))
          val best = syms
            .select(col("wc"), explode(when(size(col("l")) >= 2,
                transform(sequence(lit(0), size(col("l")) - 2),
                  j => struct(element_at(col("l"), j + 1).as("a"),
                              element_at(col("l"), j + 2).as("b"))))
              .otherwise(array().cast("array<struct<a:string,b:string>>")))
              .as("p"))
            .groupBy(col("p.a"), col("p.b"))
            .agg(sum(col("wc")).as("cnt"))
            .orderBy(col("cnt").desc, col("a"), col("b"))
            .limit(1).collect()
          if (best.isEmpty) break() // vocabulary fully merged
          val r = best.head
          val (a, b, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
          merges += ((rank, a, b, cnt))
          val next = cur.withColumn("s",
            expr(s"replace(s, '[$a][$b]', '[$a$b]')"))
          next.persist()
          cur.unpersist()
          cur = next
        }
      }
    } finally cur.unpersist()
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("left_sym", StringType, nullable = false),
      StructField("right_sym", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq.map { case (r, a, b, c) =>
        Row(r, a, b, a + b, c) }, 1), schema)
  }

  /** Train `k` merges and persist them as a Delta-table ARTIFACT (same
    * pattern as the minhash/IVF/PQ indexes: train once, store, serve
    * many) — segmentation then reads the merge list, never the training
    * corpus. */
  def buildBpeVocab(df: DataFrame, textCol: String, k: Int,
                    path: String): Long =
    graft.delta.DeltaTable.write(trainMerges(df, textCol, k), path,
      org.apache.spark.sql.SaveMode.Overwrite)

  /** Segment with a STORED vocabulary: reads the (rank-ordered) merge
    * list from the artifact — k rows — and applies [[tokenStats]]; the
    * training corpus is never touched. */
  def tokenStatsFromVocab(spark: org.apache.spark.sql.SparkSession,
                          vocabPath: String, df: DataFrame,
                          idCol: String, textCol: String): DataFrame = {
    val merges = graft.delta.DeltaTable.forPath(spark, vocabPath).toDF
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
      .toSeq
    tokenStats(df, idCol, textCol, merges)
  }

  /** Tokenize `textCol` with an ordered merge list (the inference side of
    * [[trainMerges]]): same bracket-string representation, the merges
    * applied in rank order, then per-document token statistics —
    * (id, n_words, n_tokens, avg_tokens_per_word). One projection per
    * merge, no shuffles beyond the final per-document aggregation. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    // empty-string splits filtered INSIDE the array so a wordless
    // document still yields one null row (explode_outer) and stays in
    // the per-document output
    val words = InputWidth.widen(df)
      .select(col(idCol).as("id"),
        explode_outer(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
          w => w =!= "")).as("word"))
    var cur = words.withColumn("s",
      when(col("word").isNull, lit(null).cast("string")).otherwise(
        concat(lit("["),
          concat_ws("][", transform(sequence(lit(1), length(col("word"))),
            i => col("word").substr(i, lit(1)))),
          lit("]"))))
    merges.foreach { case (a, b) =>
      cur = cur.withColumn("s", expr(s"replace(s, '[$a][$b]', '[$a$b]')"))
    }
    cur
      .withColumn("ntok",
        when(col("s").isNull, 0L)
          .otherwise((length(col("s")) -
            length(regexp_replace(col("s"), "\\[", ""))).cast("long")))
      .groupBy(col("id"))
      .agg(count(col("word")).as("n_words"),
           sum(col("ntok")).cast("bigint").as("n_tokens"))
      .select(col("id"), col("n_words"), col("n_tokens"),
        when(col("n_words") > 0,
          col("n_tokens").cast("double") / col("n_words").cast("double"))
          .otherwise(0.0).as("avg_tokens_per_word"))
  }
}
