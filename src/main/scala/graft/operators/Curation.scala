package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * splits and samples, sequence packing, scrubbing, and mixture sampling.
  *
  * Scale design (the 100 TB story):
  *  - every assignment is a PURE FUNCTION of the row (hash of a stable
  *    id) — no global state, no sampling service, no driver round trip;
  *    re-running the pipeline on a grown corpus keeps every previously
  *    assigned row in the same split/sample, which is what makes
  *    train/test contamination auditable;
  *  - the only shuffles are the final aggregations callers add and the
  *    per-bucket window in [[packSequences]], whose partition count is
  *    caller-chosen (buckets ≫ executors → no single-task window, state
  *    per task bounded by corpus/buckets);
  *  - [[domainMix]] attaches per-domain rates through a BROADCAST join
  *    (domain tables are small by definition), so mixing adds no shuffle
  *    of the corpus itself.
  */
object Curation {

  private val Denom = 1000000L

  /** Deterministic split assignment: hash of the id modulo 100, cut by
    * cumulative `weights` (name → percent, summing to ≤ 100; rows past
    * the last cut get the final name). Adds a `split` column. */
  def hashSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Int)]): DataFrame =
    df.withColumn("split",
      splitColumn(md5Hash32(col(idCol).cast("string")) % 100, weights))

  /** The percentile-bucket → split-name decision shared by every split
    * face (the decision function IS the contract the DuckDB oracles
    * mirror — one definition or the faces drift). */
  private def splitColumn(bucket: Column,
                          weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.map(_._2).sum == 100,
      "split weights must sum to 100")
    val cuts = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    weights.init.zip(cuts.init)
      .foldLeft(when(lit(false), lit(null: String))) {
        case (acc, ((name, _), cut)) => acc.when(bucket < cut, name)
      }
      .otherwise(weights.last._1)
  }

  /** Leakage-safe train/eval split: near-duplicate documents must land
    * in the SAME split, or the eval set leaks training text — the
    * classic post-hoc dedup-audit finding (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499, found thousands of eval examples verbatim in
    * training splits cut by per-document hashing).
    *
    * `pairs` (columns `i`, `j`) come from ANY near-dup detector
    * ([[Dedup.exact]] groups, [[Dedup.minhashLsh]],
    * [[Dedup.ngramJaccard]]…); they collapse into connected components
    * and the whole cluster splits by the hash of its CLUSTER label (the
    * min reachable id). Twins can never straddle the cut; documents in
    * no pair hash their own id, so a pair-free corpus gets decisions
    * with the same hash convention as [[hashSplit]] on the cluster
    * label.
    *
    * Scale shape: components over (id, label) pairs only
    * ([[Dedup.connectedComponents]]'s contract), one broadcast-or-
    * shuffle join to attach labels, one hash projection — document
    * payloads never ride a shuffle. */
  def groupSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                 weights: Seq[(String, Int)]): DataFrame = {
    val clusters = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
      .withColumnRenamed("cluster", "__gs_cluster")
    docs.join(clusters, Seq(idCol), "left")
      .withColumn("__gs_cluster",
        coalesce(col("__gs_cluster"), col(idCol)))
      .withColumn("split", splitColumn(
        md5Hash32(col("__gs_cluster").cast("string")) % 100, weights))
      .drop("__gs_cluster")
  }

  /** Deterministic training-order shuffle + sharding: every row gets a
    * `shard` (`hash(seed:id) mod numShards`) and a 1-based `pos` within
    * its shard ordered by the same hash (id tie-break) — the reproducible
    * global permutation a training run reads its data in. Different
    * seeds draw independent permutations (new epoch = new seed); the
    * same seed always yields the same order, on any cluster size.
    *
    * Scale shape: one hash projection, one shuffle by shard, one
    * within-shard sort — exactly the layout job that materializes
    * training shards at 100 TB; `pos` never windows over the whole
    * corpus (numShards ≫ executors keeps per-task sort state bounded).
    */
  def shuffleShard(df: DataFrame, idCol: String, seed: String,
                   numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    import org.apache.spark.sql.expressions.Window
    val h = md5Hash32(col(idCol).cast("string"), lit(seed))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__order_h").asc, col(idCol).asc)
    df.withColumn("__order_h", h)
      .withColumn("shard", pmod(col("__order_h"), lit(numShards.toLong))
        .cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__order_h")
  }

  /** Deterministic salted sample: keeps a row iff
    * `hash(salt:id) mod 1e6 < rate·1e6`. Different salts draw
    * independent samples; the same salt always draws the same one. */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
                 salt: String): DataFrame = {
    require(rate >= 0 && rate <= 1, "sample rate must be in [0,1]")
    df.filter(
      md5Hash32(col(idCol).cast("string"), lit(salt)) % Denom
        < (rate * Denom).toLong)
  }

  /** Deterministic importance sampling: keep each row with probability
    * equal to its weight (clamped to [0,1]) — quality-weighted corpus
    * selection with re-run-stable, auditable decisions (a pure hash
    * threshold, no RNG state; same family as [[hashSample]], which is
    * the constant-weight special case). The comparison threshold uses an
    * explicit floor so both engines compute the identical integer cut. */
  def importanceSample(df: DataFrame, idCol: String, weight: Column,
                       salt: String): DataFrame = {
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    df.filter(
      md5Hash32(col(idCol).cast("string"), lit(salt)) % Denom <
        floor(w * Denom.toDouble).cast("long"))
  }

  /** Concat-then-chunk sequence packing (the standard LLM pre-training
    * layout): within each of `buckets` hash buckets, documents are laid
    * end-to-end in id order and the token stream is cut into fixed
    * `ctxLen` chunks; a document may straddle a chunk boundary. Returns
    * one row per document with its bucket and the first/last chunk index
    * it lands in.
    *
    * The running offset is a window over the BUCKET, not the corpus —
    * choose `buckets` ≫ executor count and each task holds one bucket's
    * documents only. */
  def packSequences(df: DataFrame, idCol: String, tokCountCol: Column,
                    ctxLen: Int, buckets: Int): DataFrame = {
    require(ctxLen > 0 && buckets > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol), tokCountCol.cast("long").as("toks"),
        pmod(md5Hash32(col(idCol).cast("string")), lit(buckets)).as("bucket"))
      .filter(col("toks") > 0)
      .withColumn("offset", coalesce(sum(col("toks")).over(w), lit(0L)))
      .select(col(idCol), col("bucket"), col("toks"),
        floor(col("offset") / ctxLen).as("first_chunk"),
        floor((col("offset") + col("toks") - 1) / ctxLen).as("last_chunk"))
  }

  /** Sequence-length bucketing for training batches: documents grouped
    * into fixed-width token-count buckets (`bucket = toks div width`),
    * reporting per bucket the document/token totals and the padding
    * waste a per-bucket batcher would pay when padding every sequence to
    * the bucket's observed max (`n_docs * max_toks - total_tokens`) —
    * the number length-bucketed batching exists to minimize. Exact
    * integers end to end; one partial-aggregated shuffle on the bucket
    * key, so 100 TB of documents reduce map-side to O(buckets) rows. */
  def lengthBuckets(df: DataFrame, tokCountCol: Column,
                    bucketWidth: Int): DataFrame = {
    require(bucketWidth > 0)
    df.select(tokCountCol.cast("long").as("toks"))
      .filter(col("toks") > 0)
      .groupBy(floor(col("toks") / bucketWidth).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("toks")).as("total_tokens"),
           max(col("toks")).as("max_toks"))
      .withColumn("padding_waste",
        col("n_docs") * col("max_toks") - col("total_tokens"))
  }

  /** Scrub a regex from the text (PII patterns, denylist terms),
    * replacing every match with `replacement`. Adds `<out>` (scrubbed
    * text) and `<out>_hits` (match count) — pure per-row codegen'd
    * expressions, no shuffle. */
  def scrub(df: DataFrame, textCol: String, pattern: String,
            replacement: String, out: String): DataFrame =
    df.withColumn(out, regexp_replace(col(textCol), pattern, replacement))
      .withColumn(s"${out}_hits", size(regexp_extract_all(col(textCol),
        lit(pattern), lit(0))))

  /** Exact-size stratified sample: the `n` rows of each stratum with the
    * smallest salted hash (ties broken by id — fully deterministic).
    * One shuffle on the stratum key; the rank window partitions by
    * stratum, so task state is bounded by the largest stratum, never the
    * corpus. For strata too large for one task, pre-thin with
    * [[hashSample]] at a rate that keeps ≫ n expected survivors — the
    * hash ORDER is the same in both, so thinning never changes the
    * selected set as long as all n survive it. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       n: Int, salt: String): DataFrame = {
    require(n > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5Hash32(col(idCol).cast("string"), lit(salt)), col(idCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__rank")
  }

  /** Benchmark decontamination (the GPT-3/PaLM training-data hygiene
    * step): flag every corpus document sharing at least one word `n`-gram
    * with the benchmark set. Adds a boolean `contaminated` column.
    *
    * Scale shape: the benchmark is small by definition (eval suites are
    * thousands of documents, the corpus is billions), so its distinct
    * gram set BROADCASTS to the corpus-side semi-join — the corpus is
    * scanned once, never shuffled, and only the (small) contaminated-id
    * set rides a second broadcast back onto the full rows. Neither join
    * moves corpus payloads. */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 5): DataFrame = {
    val benchGrams = benchmark
      .select(tokens(col(benchTextCol)).as("toks"))
      .select(explode(wordShinglesOf(col("toks"), n)).as("gram"))
      .distinct()
    val contaminatedIds = df
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(wordShinglesOf(col("toks"), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(col(idCol))
      .distinct()
      .withColumn("contaminated", lit(true))
    // contaminatedIds is (id, flag)-narrow but its ROW COUNT tracks how
    // contaminated the corpus is — unbounded. No broadcast hint: AQE
    // broadcasts it when genuinely small and shuffle-joins otherwise.
    df.join(contaminatedIds, Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
  }

  /** Mixture sampling: per-domain keep rates (domain → rate in [0,1],
    * `defaultRate` otherwise) applied as a deterministic salted sample.
    * Rates attach via a broadcast join — the corpus itself is neither
    * shuffled nor collected. */
  def domainMix(df: DataFrame, idCol: String, domainCol: String,
                rates: Map[String, Double], defaultRate: Double,
                salt: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF(domainCol, "keep_rate")
    df.join(broadcast(rateDf), Seq(domainCol), "left")
      .withColumn("keep_rate", coalesce(col("keep_rate"), lit(defaultRate)))
      .filter(
        md5Hash32(col(idCol).cast("string"), lit(salt)) % Denom
          < (col("keep_rate") * Denom).cast("long"))
      .drop("keep_rate")
  }

  /** Temperature-scaled domain rebalancing (the multilingual-pretraining
    * sampler, XLM-R §3.1 shape): keep rates DERIVE from the observed
    * domain sizes instead of being caller-supplied —
    * `rate_d = (n_min / n_d)^(1 - 1/T)`, so the smallest domain keeps
    * everything and larger domains downsample toward it; T = 1 keeps the
    * natural distribution, T → ∞ flattens to uniform counts.
    *
    * Scale shape: one map-side-combinable count per domain (domains are
    * broadcast-small by definition), rates attach via a broadcast join,
    * and the keep decision is the same deterministic salted hash as
    * [[domainMix]] — the corpus is never shuffled or collected.
    *
    * Determinism note: the T = 2 exponent (0.5) evaluates via `sqrt`,
    * which IEEE requires correctly rounded — bit-identical across
    * engines, so the decision boundary replicates exactly. Other
    * exponents go through `pow`, whose final ulp is platform-dependent:
    * fine for production sampling, not for bit-exact cross-engine
    * replication. */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
                     temperature: Double, salt: String): DataFrame = {
    require(temperature >= 1.0, s"temperature must be >= 1, got $temperature")
    val exponent = 1.0 - 1.0 / temperature
    // a NULL domain is a domain like any other: it gets its own count,
    // its own rate, and a null-safe join back — an equi-join would
    // silently DROP null-domain rows while still letting their count set
    // n_min (a phantom minimum skewing every real domain's rate)
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("__n")).as("__nmin"))))
    val ratio = col("__nmin").cast("double") / col("__n").cast("double")
    val rates = withMin.select(col(domainCol).as("__dom"),
      (if (exponent == 0.5) sqrt(ratio) else pow(ratio, exponent))
        .as("__rate"))
    df.join(broadcast(rates), col(domainCol) <=> col("__dom"))
      .filter(
        md5Hash32(col(idCol).cast("string"), lit(salt)) % Denom
          < (col("__rate") * Denom).cast("long"))
      .drop("__dom", "__rate")
  }

  /** Feature-hashed linear quality scorer — the fastText-classifier
    * SHAPE (bag of hashed token features × a weight vector, mean-pooled)
    * with a deterministic pseudo-weight vector so the score is
    * bit-replayable cross-engine: bucket = hash32(token, salt) % dim,
    * weight_b = hash32(b, salt+":w") % 2001 - 1000 (an integer in
    * [-1000, 1000]), score = Σ weights / (1000 · n_tokens). Integer sums
    * then ONE division keep the double integer-derived (bit-exact in
    * both engines); swap the weight derivation for a trained vector and
    * the plan shape is production fastText scoring.
    *
    * Scale shape: one explode to (id, bucket), the weight attached by
    * expression (no weight table to join at dim ≤ 2^31), one map-side
    * combinable per-document integer aggregation. Returns
    * (id, n_tokens, score) for EVERY document (empty → score 0). */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
                        dim: Int = 64, salt: String = "q"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val toks = graft.operators.InputWidth.widen(df)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("tk"))
    val scored = toks
      .select(col("id"), explode(col("tk")).as("tok"))
      .select(col("id"),
        (md5Hash32(
          (md5Hash32(col("tok"), lit(salt)) % dim).cast("string"),
          lit(salt + ":w")) % 2001 - 1000).as("w"))
      .groupBy(col("id"))
      .agg(sum(col("w")).cast("long").as("wsum"))
    toks.select(col("id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(scored, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("wsum"), lit(0L)).cast("double") /
            (col("n_tokens").cast("double") * 1000.0)).otherwise(0.0)
          .as("score"))
  }

  /** Token-budget-constrained domain mixing: given a total token budget
    * and integer domain weights, each domain's sampling rate is
    * `min(1, budget * w_d / (Σw * tokens_d))` — the rate that lands the
    * kept corpus at (in expectation) the budget, split across domains by
    * weight, without ever over-sampling a domain past its actual volume.
    * Domains with no weight drop. The keep decision is the shared
    * salted-hash cut, with the cut computed in EXACT integer arithmetic
    * (BigInt here, HUGEINT in the DuckDB mirror) — no doubles, so the
    * decision is bit-identical cross-engine at every boundary.
    *
    * Scale shape: one map-side-combinable per-domain token aggregation
    * whose result is one row per DOMAIN (a label vocabulary, not data —
    * the same bounded-collect class as k-means centroids), then one
    * broadcast join + codegen'd hash filter over the corpus. */
  def budgetMix(df: DataFrame, idCol: String, domainCol: String,
                tokenCol: String, budget: Long,
                weights: Map[String, Long], salt: String): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      weights.values.sum > 0, "weights must be non-negative, not all zero")
    val sumW = weights.values.map(BigInt(_)).sum
    val totals = df.groupBy(col(domainCol))
      .agg(sum(col(tokenCol)).cast("long").as("__toks"))
      .collect()
      .map(r => Option(r.get(0)).map(_.toString) -> r.getLong(1)).toSeq
    val cuts = totals.map { case (dom, toks) =>
      val w = BigInt(dom.flatMap(weights.get).getOrElse(0L))
      val cut =
        if (toks <= 0 || w <= 0) BigInt(0)
        else (BigInt(budget) * w * Denom / (sumW * toks)).min(BigInt(Denom))
      (dom, cut.toLong)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val cutDf = cuts.toDF("__dom", "__cut")
    df.join(broadcast(cutDf), col(domainCol) <=> col("__dom"))
      .filter(md5Hash32(col(idCol).cast("string"), lit(salt)) % Denom
        < col("__cut"))
      .drop("__dom", "__cut")
  }

  /** Split documents into fixed-size TOKEN windows with overlap — the
    * long-document answer to a bounded context length (a 100k-token doc
    * becomes ~2k training rows; neighboring chunks share `overlap`
    * tokens so no boundary context is lost). Whitespace tokens, chunk
    * starts every `chunkTokens - overlap`, the tail chunk may be short.
    * Pure per-row expansion: no shuffle, no window, row-order free —
    * the 100 TB shape. Output: the input columns minus `textCol`, plus
    * (chunk_index, chunk_tokens, chunk_text). */
  /** Topic-balanced subsampling: partition the corpus by a trained
    * embedding k-means (the SemDeDup blocking shape — clusters adapt to
    * the data's density, unlike a fixed domain label) and cap every
    * cluster at `perCellCap` members, so an over-represented topic
    * (boilerplate, spam bursts, crawled mirror sites) cannot dominate
    * the training mix regardless of its raw volume.
    *
    * Survivor choice is the lowest ids per cluster — deterministic and
    * replayable; plug a quality score in by ranking upstream and
    * re-mapping ids if priority sampling is wanted.
    *
    * Scale shape: training and assignment are the shared broadcast-join
    * + argmax + (cell, dim)-mean machinery of [[Similarity]] (never
    * all-pairs); the per-cluster cap is one window partitioned by cell —
    * its skew is bounded by the largest cluster, and the output is at
    * most nCells * perCellCap rows. Determinism: 6-decimal rounding and
    * id tie-breaks throughout, so re-runs (and the DuckDB oracle)
    * reproduce bit-for-bit. */
  def clusterBalancedSample(df: DataFrame, idCol: String, vecCol: String,
                            nCells: Int = 16, trainIters: Int = 2,
                            perCellCap: Int = 5): DataFrame = {
    val c = Similarity.corpusFace(df, idCol, vecCol)
    val cents = Similarity.trainedCentroids(df, c, idCol, vecCol,
      nCells, trainIters)
    val assign = Similarity.assignCells(c, cents)
      .select(col("neighbor_id").as(idCol), col("cell"))
    import org.apache.spark.sql.expressions.Window
    assign
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col(idCol))))
      .filter(col("__rk") <= perCellCap)
      .select(col(idCol), col("cell"))
  }

  def chunkWithOverlap(df: DataFrame, textCol: String,
                       chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be > 0, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val step = chunkTokens - overlap
    df.withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .withColumn("__start", explode(sequence(lit(0),
        greatest(size(col("__toks")) - 1, lit(0)), lit(step))))
      .withColumn("chunk_index", (col("__start") / step).cast("int"))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(chunkTokens))))
      .withColumn("chunk_tokens",
        size(slice(col("__toks"), col("__start") + 1, lit(chunkTokens))))
      .drop(textCol, "__toks", "__start")
  }
}
