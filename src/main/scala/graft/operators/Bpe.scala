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
  * dictionary (map-side combinable; the corpus never re-scans). The
  * dictionary is VOCABULARY-sized (distinct words, ≈millions at 100 TB),
  * so under `spark.graft.bpe.maxDictWords` it collects ONCE and the k
  * argmax rounds run as classic in-memory fast-BPE (pair-count heap with
  * lazy deletion, per-merge updates touching only affected words) —
  * 32k merges in seconds, zero per-merge Spark jobs. Above the bound the
  * fallback runs each round distributed: a vocabulary-sized pair explode
  * + grouped sum + top-1 (TakeOrdered) + one projection per merge, with
  * only k single-row collects of driver traffic — the argmax decision,
  * which IS the sequential dependency of the BPE objective. Both paths
  * produce IDENTICAL merge lists (spec-proven): same every-occurrence
  * pair counting, same left-to-right non-overlapping merge application,
  * same (count desc, pair asc) tie-break. */
object Bpe {

  /** Dictionary-size bound under which merge training collects the
    * weighted word dictionary and runs in memory (the cc/gram-dict
    * driver-bound precedent: the dictionary is orders of magnitude
    * smaller than the corpus and each entry is one short word). */
  val MaxDictWordsKey = "spark.graft.bpe.maxDictWords"
  val MaxDictWordsDefault = 2000000L

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
    val bound = math.min(spark.conf
      .getOption(MaxDictWordsKey).map(_.toLong)
      .getOrElse(MaxDictWordsDefault), Int.MaxValue - 2L)
    // one job decides the path: a ≤bound dictionary arrives complete (and
    // small — words are short), an overflowing one falls back distributed
    val dict = words.limit(bound.toInt + 1).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val merges =
      if (dict.length <= bound) trainMergesLocal(dict, k)
      else trainMergesDistributed(words, k)
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("left_sym", StringType, nullable = false),
      StructField("right_sym", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.map { case (r, a, b, c) =>
        Row(r, a, b, a + b, c) }, 1), schema)
  }

  /** In-memory fast-BPE over a collected weighted word dictionary.
    * Pair counts live in a hash map; the argmax comes from a max-heap
    * with LAZY deletion (every count change pushes a fresh entry; a
    * popped entry is valid only if it still matches the map). Each merge
    * touches only the words that contain the pair (tracked per pair), so
    * total work is O(initial_pairs + k * avg_affected_word_len) — not
    * O(k * vocabulary). */
  private[graft] def trainMergesLocal(
      dict: Array[(String, Long)],
      k: Int): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] =
      dict.map(_._1.map(_.toString).toArray)
    val wcs: Array[Long] = dict.map(_._2)

    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // max-heap: higher count wins; ties prefer the lexicographically
    // SMALLER pair — identical to the distributed orderBy(cnt desc, a, b)
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val ca = y._2.compareTo(x._2)
          if (ca != 0) ca else y._3.compareTo(x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)

    // per-word pair counts into a small LOCAL map — every adjacent
    // occurrence counts (so "aaa" contributes (a,a) twice), matching the
    // distributed path's position-list explode
    def localCounts(s: Array[String]): mutable.HashMap[(String, String), Int] = {
      val m = mutable.HashMap.empty[(String, String), Int]
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        m.update(p, m.getOrElse(p, 0) + 1)
        i += 1
      }
      m
    }

    // left-to-right non-overlapping, same as replace('[a][b]' -> '[ab]')
    def applyMerge(s: Array[String], a: String, b: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += a + b; i += 2
        } else { out += s(i); i += 1 }
      }
      out.toArray
    }

    var wi = 0
    while (wi < syms.length) {
      val w = wcs(wi)
      localCounts(syms(wi)).foreach { case (p, c) =>
        pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c * w)
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
      }
      wi += 1
    }
    pairCounts.foreach { case ((a, b), n) => heap.enqueue((n, a, b)) }

    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      var top: (Long, String, String) = null
      while (top == null && heap.nonEmpty) {
        val c = heap.dequeue()
        if (pairCounts.get((c._2, c._3)).contains(c._1)) top = c
      }
      if (top == null) exhausted = true
      else {
        val (cnt, a, b) = top
        merges += ((rank, a, b, cnt))
        val affected = pairWords.get((a, b)).map(_.toArray).getOrElse(Array.empty)
        // net-changed pairs only: unchanged pairs (the bulk of every
        // word) never touch the global map, and the heap receives ONE
        // entry per changed pair per merge (after all words settle), not
        // one per word — the difference between seconds and hours at
        // production k
        val changed = mutable.HashSet.empty[(String, String)]
        affected.foreach { w =>
          val old = localCounts(syms(w))
          syms(w) = applyMerge(syms(w), a, b)
          val neu = localCounts(syms(w))
          (old.keySet ++ neu.keySet).foreach { p =>
            val d = neu.getOrElse(p, 0) - old.getOrElse(p, 0)
            val oldC = old.getOrElse(p, 0); val neuC = neu.getOrElse(p, 0)
            if (d != 0) {
              val n = pairCounts.getOrElse(p, 0L) + d.toLong * wcs(w)
              if (n == 0L) pairCounts.remove(p) else pairCounts.update(p, n)
              changed += p
            }
            if (oldC > 0 && neuC == 0) pairWords.get(p).foreach(_ -= w)
            else if (oldC == 0 && neuC > 0)
              pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += w
          }
        }
        pairCounts.remove((a, b))
        pairWords.remove((a, b))
        changed.foreach { p =>
          pairCounts.get(p).foreach(n => heap.enqueue((n, p._1, p._2)))
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Distributed per-merge fallback for dictionaries beyond the driver
    * bound: each round is one pair explode + grouped sum + top-1 over the
    * cached vocabulary frame, then one literal-replace projection. */
  private def trainMergesDistributed(
      words: DataFrame, k: Int): Seq[(Int, String, String, Long)] = {
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
    merges.toSeq
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
    * [[trainMerges]]) and return per-document token statistics —
    * (id, n_words, n_tokens, avg_tokens_per_word).
    *
    * Segmentation runs through the native
    * [[graft.functions.BpeTokenCounts]] expression: ONE projection
    * regardless of k, per-word cost independent of the vocabulary size.
    * The original one-`replace`-projection-per-merge formulation (kept as
    * [[tokenStatsChained]], spec-proven identical) grows its PLAN with k
    * — unusable at production vocabularies (32k merges = 32k chained
    * projections). */
  def tokenStats(df: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val docs = InputWidth.widen(df)
      .select(col(idCol).as("id"),
        filter(split(lower(col(textCol)), "[^a-z0-9]+"), w => w =!= "")
          .as("tk"))
    docs
      .select(col("id"), size(col("tk")).cast("long").as("n_words"),
        graft.functions.BpeTokenCounts(col("tk"), merges).as("counts"))
      .select(col("id"), col("n_words"),
        aggregate(col("counts"), lit(0L), (acc, x) => acc + x)
          .as("n_tokens"))
      .select(col("id"), col("n_words"), col("n_tokens"),
        when(col("n_words") > 0,
          col("n_tokens").cast("double") / col("n_words").cast("double"))
          .otherwise(0.0).as("avg_tokens_per_word"))
  }

  /** The literal-`replace`-chain segmentation (one projection per merge):
    * the reference implementation [[tokenStats]] is spec-proven against —
    * exact for any merge list, but its plan depth is O(k). */
  private[graft] def tokenStatsChained(df: DataFrame, idCol: String,
                                       textCol: String,
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
