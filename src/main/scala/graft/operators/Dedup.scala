package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * Scale design (the 100 TB story):
  *  - nothing here compares all pairs: every near-dup variant generates
  *    CANDIDATE pairs through a blocking key (LSH band, simhash band,
  *    rarest-prefix gram) and only verifies candidates — the shuffle
  *    volume tracks actual similarity, not O(docs²);
  *  - candidate generation joins carry ONLY (block key, id): the wide
  *    shingle/vector payloads never ride through the pair-producing
  *    shuffle and are re-attached to the surviving pairs afterwards;
  *  - the per-doc signatures (minhash, simhash) are computed relationally
  *    — explode + codegen'd aggregate — because Spark's higher-order
  *    array lambdas evaluate interpreted, which dominates at corpus scale;
  *  - per-band self-joins shuffle both sides by the band key — exactly
  *    the co-partitioned equi-join Spark distributes well; skewed buckets
  *    (a degenerate shingle) can be salted by widening the band index.
  */
object Dedup {

  /** Exact deduplication by content key: hash-groupBy, one shuffle of
    * (key, id) pairs. Returns one row per duplicate group with the
    * representative (minimum) id and the group size. */
  def exact(df: DataFrame, idCol: String, keyCol: Column): DataFrame =
    df.select(col(idCol).as("id"), md5(keyCol.cast("string")).as("key"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("group_size"),
           min(col("id")).as("representative"))
      .filter(col("group_size") > 1)

  /** CCNet-style LINE-level deduplication (Wenzek et al. 2020): count
    * each line's occurrences across the whole corpus and mark the lines
    * whose content repeats in `minOccurrences`-or-more places —
    * boilerplate (headers, navigation, license blurbs) that survives
    * whole-document dedup because the surrounding bytes differ.
    *
    * Input is one row per (document, line); returns the same rows plus
    * `line_occ` (corpus-wide occurrence count of the trimmed content) —
    * callers filter `line_occ < minOccurrences` to strip, or aggregate
    * for reporting. Blank lines are never counted as duplicates of each
    * other (occ forced to 1).
    *
    * Scale shape: lines reduce to 60-bit content hashes; one (hash)-keyed
    * count (map-side combinable) and one hash-keyed join back — the
    * shuffled payload is (hash, count) and (hash, doc, idx), never the
    * line text riding the wide join twice. Same plan family as
    * [[exactSubstrSpans]]'s window counting. */
  def lineDedup(lines: DataFrame, lineCol: String): DataFrame = {
    val h = graft.functions.md5Hash60(trim(col(lineCol)))
    val withHash = lines.withColumn("__lh",
      when(length(trim(col(lineCol))) === 0, lit(null)).otherwise(h))
    val counts = withHash.filter(col("__lh").isNotNull)
      .groupBy(col("__lh")).agg(count(lit(1)).as("line_occ"))
    withHash.join(counts, Seq("__lh"), "left")
      .withColumn("line_occ", coalesce(col("line_occ"), lit(1L)))
      .drop("__lh")
  }

  /** Cross-document duplicated-n-gram fraction — the corpus-level
    * repetition signal of the MassiveText/RefinedWeb filtering stacks
    * (Rae et al. 2021; Penedo et al. 2023): for each document, the
    * fraction of its word-n-gram POSITIONS whose n-gram also occurs in
    * at least `minDocs - 1` OTHER documents. High values mark boilerplate
    * and template text that survives whole-document dedup because the
    * surrounding bytes differ.
    *
    * Returns (id, n_positions, dup_frac). Documents shorter than n words
    * have zero positions and dup_frac 0.
    *
    * Scale shape: one explode to (doc, gram, positional count) partial-
    * aggregated map-side; document frequency is a second (gram)-keyed
    * count over the DISTINCT (doc, gram) stream (already grouped, no
    * second explode); the gram-keyed join back is the only wide shuffle
    * and carries (gram, doc, count) — never document text. Nothing is
    * all-pairs and nothing collects; skewed grams (a boilerplate n-gram
    * in millions of docs) stay one aggregation key each, and AQE's
    * skew-join handling splits the join side if one gram dominates. */
  def crossDocNgramDupFraction(df: DataFrame, idCol: String,
                               textCol: String, n: Int = 5,
                               minDocs: Int = 2): DataFrame = {
    val toks = InputWidth.widen(df)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("tk"))
    val grams = toks.select(col("id"),
        when(size(col("tk")) >= n,
          transform(sequence(lit(0), size(col("tk")) - n),
            i => concat_ws(" ", slice(col("tk"), i + 1, lit(n)))))
          .otherwise(array().cast("array<string>")).as("grams"))
      .select(col("id"), explode_outer(col("grams")).as("g"))
      .groupBy(col("id"), col("g"))
      .agg(count(when(col("g").isNotNull, 1)).as("cnt"))
    val docFreq = grams.filter(col("g").isNotNull)
      .groupBy(col("g")).agg(count(lit(1)).as("dfreq"))
    grams.join(docFreq, Seq("g"), "left")
      .groupBy(col("id"))
      .agg(sum(when(col("g").isNotNull, col("cnt")).otherwise(0))
             .cast("bigint").as("n_positions"),
           sum(when(col("dfreq") >= minDocs, col("cnt")).otherwise(0))
             .cast("bigint").as("dup_positions"))
      .select(col("id"), col("n_positions"),
        when(col("n_positions") > 0,
          col("dup_positions").cast("double") /
            col("n_positions").cast("double")).otherwise(0.0)
          .as("dup_frac"))
  }

  /** Exact duplicated-substring spans — the ExactSubstr deduplication of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"), re-expressed relationally: per document, the maximal token
    * spans every one of whose `minLen`-token windows occurs at least
    * `minCount` times in the corpus (occurrences in the SAME document
    * count — a verbatim self-repeat is a duplicate too). Returns one row
    * per merged span: (id, span_start, span_end) in 0-based token
    * positions, end inclusive.
    *
    * Equivalence to the suffix-array formulation: a duplicated substring
    * of length ≥ minLen contains only duplicated minLen-windows, and any
    * maximal run of duplicated windows reconstructs the maximal
    * duplicated region's token coverage — so marking windows globally and
    * merging overlapping/adjacent coverages per document yields exactly
    * the token set ExactSubstr removes, without a global suffix sort.
    *
    * Scale shape: one explode to (id, pos, 60-bit window hash) — window
    * TEXT never rides a shuffle, only its md5 prefix; the global
    * occurrence count is one map-side-combinable aggregation on the hash;
    * the hash-keyed join back (AQE skew-split if one boilerplate window
    * dominates) is the only wide exchange; span merging is a per-document
    * gaps-and-islands window over the duplicated positions only. A
    * suffix array would globally sort every suffix of the corpus; this is
    * three hash-keyed exchanges and no global order. */
  def exactSubstrSpans(df: DataFrame, idCol: String, textCol: String,
                       minLen: Int = 8, minCount: Int = 2): DataFrame = {
    val wins = exactSubstrWindows(df, idCol, textCol, minLen)
    val dupHashes = wins.groupBy(col("h"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= minCount)
      .select(col("h"))
    // duplicated window start positions, islanded per document: windows
    // cover [pos, pos+minLen-1]; consecutive duplicated starts belong to
    // one span iff the coverages overlap or touch (gap in starts ≤ minLen)
    val dup = wins.join(dupHashes, Seq("h")).select(col("id"), col("pos"))
    islandSpans(dup, minLen)
  }

  /** Gaps-and-islands merge of duplicated window START positions into
    * maximal spans (per document; starts ≤ minLen apart share a span
    * because their coverages overlap or touch). Shared by the one-shot
    * and the index-probing span paths so they cannot diverge. */
  private def islandSpans(dup: DataFrame, minLen: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    dup
      .withColumn("newSpan",
        when(col("pos") - lag(col("pos"), 1).over(w) <= minLen, 0)
          .otherwise(1))
      .withColumn("island", sum(col("newSpan"))
        .over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
           (max(col("pos")) + lit(minLen - 1)).as("span_end"))
      .select(col("id"), col("span_start"), col("span_end"))
  }

  /** Persist a corpus's window-occurrence table `(h, occ)` as a Delta
    * artifact — the ExactSubstr analogue of [[buildMinhashIndex]]: the
    * corpus text is hashed ONCE; every later batch probes and increments
    * the stored counts instead of re-scanning the corpus (the
    * checkpoint-vs-log split applied to substring dedup). Occurrence
    * counts are additive, so the artifact grows by appended partials,
    * never by recompute. Returns the committed version (counting the
    * rows back would re-run the corpus-sized aggregation). */
  def buildSubstrIndex(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String, corpus: DataFrame,
                       idCol: String, textCol: String, minLen: Int = 8,
                       configuration: Map[String, String] = Map.empty): Long = {
    val counts = exactSubstrWindows(corpus, idCol, textCol, minLen)
      .groupBy(col("h")).agg(count(lit(1)).as("occ"))
    // growing artifacts self-compact by default (the LSH-index /
    // BM25-postings policy): per-batch appends otherwise accrete one
    // file per commit and probe plans degrade with the file count.
    // autoCompact bounds FILES; [[compactSubstrIndex]] stays the lever
    // for partial-row MULTIPLICITY (one row per h again). Callers can
    // override (the compaction spec pins the uncompacted degradation).
    graft.delta.DeltaTable.write(counts, indexPath,
      org.apache.spark.sql.SaveMode.Overwrite,
      configuration =
        Map("delta.autoOptimize.autoCompact" -> "true") ++ configuration)
  }

  /** ExactSubstr spans for an incoming BATCH against the corpus-so-far,
    * through the persisted `(h, occ)` artifact: a batch window is
    * duplicated iff its stored count + its in-batch count reaches
    * `minCount` — exactly the verdict [[exactSubstrSpans]] over
    * (corpus ∪ batch) reaches for the batch's documents (spec-proven).
    * The plan scans the batch text and the index table only; the corpus
    * text is never re-read.
    *
    * Growth is LSM-shaped: the batch's counts APPEND as partial rows
    * (one blind O(batch) commit — a MERGE would rewrite artifact files
    * everywhere the uniformly-hashed keys land, i.e. all of them) and
    * probes SUM the partials per matching hash (the batch's hash set
    * broadcasts into a semi-join, so the index side is one column-pruned
    * scan, no artifact-wide shuffle). `delta.autoOptimize.autoCompact`
    * bounds the artifact's file count; [[compactSubstrIndex]]
    * re-aggregates the partials when their row multiplicity warrants.
    * `idempotentTxn` makes orchestrator retries exactly-once. The
    * returned frame plans against the pre-append snapshot (immutable
    * file list), so the lazy result cannot see the batch's own counts
    * twice. */
  def incrementalSubstrSpans(spark: org.apache.spark.sql.SparkSession,
                             indexPath: String, batch: DataFrame,
                             idCol: String, textCol: String,
                             minLen: Int = 8, minCount: Int = 2,
                             idempotentTxn: Option[(String, Long)] = None): DataFrame = {
    // persisted for the two EAGER uses inside this call (the append and
    // its own probe side); released before returning — the lazy result
    // re-derives batch windows from lineage when consumed (batch-sized
    // work by definition; holding the cache for an unknowable caller
    // lifetime would leak blocks across a long-lived ingest session —
    // the incrementalMinhashLshPersisted precedent)
    val wins = exactSubstrWindows(batch, idCol, textCol, minLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batchCounts = wins.groupBy(col("h")).agg(count(lit(1)).as("occ"))
    // an idempotent RETRY must return the first attempt's verdicts: if
    // the ledger says this (appId, version) already folded, the stored
    // counts INCLUDE one copy of this batch's own counts — subtract it,
    // or a unique batch window would count itself twice and come back a
    // false duplicate on replay
    val alreadyFolded = idempotentTxn.exists { case (id, v) =>
      val log = graft.delta.DeltaLog.forTable(spark, indexPath)
      log.tableExists && log.update().setTransactions
        .find(_.appId == id).exists(_.version >= v)
    }
    // partial rows per h sum at probe time (broadcast the batch's hash
    // set; the index side stays a pruned scan + map-side partial agg)
    val idxRelevant = graft.delta.DeltaTable.forPath(spark, indexPath).toDF
      .join(broadcast(batchCounts.select(col("h"))), Seq("h"), "left_semi")
      .groupBy(col("h")).agg(sum(col("occ")).as("idx_occ"))
    val ownAppend = if (alreadyFolded) col("occ") else lit(0L)
    val dupHashes = batchCounts.join(idxRelevant, Seq("h"), "left")
      .filter(col("occ") + coalesce(col("idx_occ"), lit(0L)) - ownAppend
        >= minCount)
      .select(col("h"))
    val result = islandSpans(
      wins.join(dupHashes, Seq("h")).select(col("id"), col("pos")), minLen)
    graft.delta.DeltaTable.write(batchCounts, indexPath,
      org.apache.spark.sql.SaveMode.Append, idempotentTxn = idempotentTxn)
    wins.unpersist(blocking = false)
    result
  }

  /** Re-aggregate the substring artifact's partial count rows into one
    * row per hash — the LSM compaction step; run when batch appends have
    * multiplied row multiplicity. One grouped rewrite, results
    * unchanged (counts are additive). */
  def compactSubstrIndex(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String): Long = {
    val agg = graft.delta.DeltaTable.forPath(spark, indexPath).toDF
      .groupBy(col("h")).agg(sum(col("occ")).as("occ"))
    graft.delta.DeltaTable.write(agg, indexPath,
      org.apache.spark.sql.SaveMode.Overwrite)
  }

  /** Persist a benchmark set's DISTINCT window hashes — the
    * decontamination artifact: benchmarks are fixed while the corpus
    * streams, so the bench side hashes once and every corpus batch
    * semi-joins the stored table. */
  def buildBenchWindowIndex(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String, bench: DataFrame,
                            benchIdCol: String, benchTextCol: String,
                            minLen: Int = 8): Long =
    graft.delta.DeltaTable.write(
      exactSubstrWindows(bench, benchIdCol, benchTextCol, minLen)
        .select(col("h")).distinct(),
      indexPath, org.apache.spark.sql.SaveMode.Overwrite)

  /** [[exactSubstrContamination]] against a PERSISTED benchmark-hash
    * artifact: scans the corpus batch and the stored hash table only. */
  def substrContaminationIndexed(spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String, corpus: DataFrame,
                                 idCol: String, textCol: String,
                                 minLen: Int = 8): DataFrame =
    contaminationAgainst(corpus, idCol, textCol,
      graft.delta.DeltaTable.forPath(spark, indexPath).toDF
        .select(col("h")), minLen)

  /** Per-document ExactSubstr summary over [[exactSubstrSpans]]:
    * (id, n_tokens, n_spans, dup_tokens, dup_frac) for EVERY input
    * document (zero spans → zeros). dup_tokens is the size of the span
    * union — spans are disjoint by construction. */
  def exactSubstrStats(df: DataFrame, idCol: String, textCol: String,
                       minLen: Int = 8, minCount: Int = 2): DataFrame = {
    val docs = InputWidth.widen(df)
      .select(col(idCol).as("id"), tokenCount(col(textCol)).as("n_tokens"))
    val spans = exactSubstrSpans(df, idCol, textCol, minLen, minCount)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
           sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
    docs.join(spans, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("dup_tokens"), lit(0L)).cast("double") /
            col("n_tokens").cast("double")).otherwise(0.0).as("dup_frac"))
  }

  /** ExactSubstr removal: drops every token covered by a duplicated span
    * (ALL occurrences — keep-one policies are a caller-side choice of
    * which spans to feed back). Returns (id, clean_text, kept_tokens).
    *
    * The span list joins back per document (doc-local, bounded by
    * n_tokens/minLen) and the kept-token filter runs inside the row —
    * no second corpus-wide shuffle beyond [[exactSubstrSpans]]'s own. */
  def exactSubstrStrip(df: DataFrame, idCol: String, textCol: String,
                       minLen: Int = 8, minCount: Int = 2): DataFrame = {
    val docs = InputWidth.widen(df)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("tk"))
    val spanArrs = exactSubstrSpans(df, idCol, textCol, minLen, minCount)
      .groupBy(col("id"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("spans"))
    // sequence(0, -1) flips to a descending [0, -1] on empty docs — guard
    val idx = when(size(col("tk")) === 0, array().cast("array<long>"))
      .otherwise(sequence(lit(0), size(col("tk")) - 1).cast("array<long>"))
    docs.join(spanArrs, Seq("id"), "left")
      .select(col("id"),
        filter(zip_with(col("tk"), idx,
            (tok, i) => struct(tok.as("tok"), i.as("i"))),
          e => col("spans").isNull ||
            !exists(col("spans"), s =>
              e("i") >= s("span_start") && e("i") <= s("span_end")))
          .as("kept"))
      .select(col("id"),
        concat_ws(" ", transform(col("kept"), e => e("tok")))
          .as("clean_text"),
        size(col("kept")).cast("long").as("kept_tokens"))
  }

  /** Cross-set exact-substring contamination — the ExactSubstr
    * DECONTAMINATION use-case (Lee et al. 2022 §5): a corpus document is
    * contaminated wherever one of its `minLen`-token windows appears
    * VERBATIM in the benchmark set. Returns, for EVERY corpus document,
    * (id, n_windows, contaminated_windows, contaminated_frac).
    *
    * Scale shape: the benchmark side reduces to DISTINCT 60-bit window
    * hashes (benchmarks are tiny next to the corpus — the join side
    * broadcasts in practice); the corpus explodes once to (id, hash) and
    * semi-joins. Window text never rides a shuffle on either side. */
  def exactSubstrContamination(corpus: DataFrame, idCol: String,
                               textCol: String, bench: DataFrame,
                               benchIdCol: String, benchTextCol: String,
                               minLen: Int = 8): DataFrame =
    contaminationAgainst(corpus, idCol, textCol,
      exactSubstrWindows(bench, benchIdCol, benchTextCol, minLen)
        .select(col("h")).distinct(), minLen)

  /** Per-corpus-document contamination stats against a (distinct)
    * benchmark window-hash frame — shared by the ad-hoc and the
    * persisted-index decontamination paths. */
  private def contaminationAgainst(corpus: DataFrame, idCol: String,
                                   textCol: String, bw: DataFrame,
                                   minLen: Int): DataFrame = {
    val cw = exactSubstrWindows(corpus, idCol, textCol, minLen)
    val perDoc = cw
      .join(bw, Seq("h"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("contaminated_windows"))
    InputWidth.widen(corpus)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("tk"))
      .select(col("id"),
        greatest(size(col("tk")) - (minLen - 1), lit(0)).cast("long")
          .as("n_windows"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), col("n_windows"),
        coalesce(col("contaminated_windows"), lit(0L))
          .as("contaminated_windows"),
        when(col("n_windows") > 0,
          coalesce(col("contaminated_windows"), lit(0L)).cast("double") /
            col("n_windows").cast("double")).otherwise(0.0)
          .as("contaminated_frac"))
  }

  /** (id, pos, h): every `minLen`-token window start with the 60-bit md5
    * of its space-joined text. Documents shorter than minLen contribute
    * nothing. */
  private def exactSubstrWindows(df: DataFrame, idCol: String,
                                 textCol: String, minLen: Int): DataFrame =
    InputWidth.widen(df)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("tk"))
      .select(col("id"),
        posexplode(when(size(col("tk")) >= minLen,
          transform(sequence(lit(0), size(col("tk")) - minLen),
            i => concat_ws(" ", slice(col("tk"), i + 1, lit(minLen)))))
          .otherwise(array().cast("array<string>"))).as(Seq("pos", "g")))
      .select(col("id"), col("pos"), md5Hash60(col("g")).as("h"))

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline: shingle → k-minhash signature (one md5 per shingle, k
    * affine transforms, k codegen'd MIN aggregates over the exploded
    * shingles) → split into `bands` bands of k/bands rows → self-join on
    * (band index, band key) over (id, key) only → distinct pairs → exact
    * jaccard verification at `threshold`. Classic banding probability: a
    * pair with jaccard j is a candidate with p = 1-(1-j^r)^b.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleWidth: Int = 3, k: Int = 12, bands: Int = 4,
                 threshold: Double = 0.7): DataFrame = {
    // tokens materialized as a column first: inline, every interpreted
    // shingle-lambda element would re-run the split (see wordShinglesOf)
    val docs = InputWidth.widen(df).select(col(idCol).as("id"),
        tokens(col(textCol)).as("toks"))
      .select(col("id"),
        ShingleExpressions.wordShinglesSorted(col("toks"), shingleWidth)
          .as("shingles"))
      .filter(size(col("shingles")) > 0)

    val candidates = minhashBandCandidates(
      docs.select(col("id"), col("shingles").as("items")), k, bands)

    // verification: re-attach shingles to the surviving pairs only
    val gi = docs.select(col("id").as("i"), col("shingles").as("sh_i"))
    val gj = docs.select(col("id").as("j"), col("shingles").as("sh_j"))
    candidates.join(gi, Seq("i")).join(gj, Seq("j"))
      .select(col("i"), col("j"),
        SortedArrayJaccard(col("sh_i"), col("sh_j")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Banded-MinHash candidate pairs over any item-set column: k minhashes
    * (one md5 per item, k affine transforms, k codegen'd MINs over the
    * exploded items) split into `bands` bands; docs sharing any band key
    * become a candidate pair. The pair-producing join carries only
    * (band, key, id) — payloads re-attach downstream. Classic banding: a
    * pair with jaccard j is a candidate with p = 1-(1-j^(k/bands))^bands. */
  private def minhashBandCandidates(docs: DataFrame, k: Int,
                                    bands: Int): DataFrame = {
    val banded = minhashBandKeys(docs, k, bands)
    val l = banded.select(col("band"), col("key"), col("id").as("i"))
    val r = banded.select(col("band"), col("key"), col("id").as("j"))
    l.join(r, Seq("band", "key"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"))
      .distinct()
  }

  /** (id, bands: array<struct<band,key>>) — one row per doc, the banded
    * MinHash signature as a COLUMN (k minhashes over the exploded items,
    * folded into `bands` band keys). The exploded probe face
    * ([[minhashBandKeys]]) and the persisted index ([[buildMinhashIndex]])
    * both derive from this. */
  private def minhashBandArray(docs: DataFrame, k: Int,
                               bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide evenly into bands")
    val rows = k / bands
    val hashed = docs.select(col("id"), explode(col("items")).as("s"))
      .select(col("id"), md5Hash32(col("s")).as("h"))
    val sigCols = (0 until k).map { j =>
      min((col("h") * minhashA(j) + minhashB(j)) % MinhashPrime).as(s"m$j")
    }
    val sigs = hashed.groupBy(col("id")).agg(sigCols.head, sigCols.tail: _*)
    sigs.select(col("id"),
      array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws(",", (0 until rows).map(r => col(s"m${b * rows + r}")): _*)
            .as("key"))
      }: _*).as("bands"))
  }

  /** (id, band, key) band-bucket rows of the banded-MinHash signature —
    * the probe-able face of the LSH index. */
  private def minhashBandKeys(docs: DataFrame, k: Int,
                              bands: Int): DataFrame =
    minhashBandArray(docs, k, bands)
      .select(col("id"), explode(col("bands")).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))

  /** Build the PERSISTABLE MinHash-LSH index of a corpus: one row per
    * document, `(id, shingles, bands: array<struct<band:int, key:string>>)`.
    * Written as a Delta table (see [[incrementalMinhashLshPersisted]])
    * this is the artifact that makes a 100 TB corpus incrementally
    * probeable — a nightly batch joins the STORED band keys and verifies
    * against the STORED shingle sets; the corpus text is never re-read,
    * re-tokenized or re-minhashed. One row per doc (not per band bucket)
    * so the wide shingle payload is stored once, and parquet column
    * pruning keeps it out of the candidate-producing probe scan — the
    * probe reads (id, bands), verification reads (id, shingles). */
  def buildMinhashIndex(df: DataFrame, idCol: String, textCol: String,
                        shingleWidth: Int = 3, k: Int = 12,
                        bands: Int = 4): DataFrame = {
    val docs = InputWidth.widen(df)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"),
        ShingleExpressions.wordShinglesSorted(col("toks"), shingleWidth)
          .as("shingles"))
      .filter(size(col("shingles")) > 0)
    val banded = minhashBandArray(
      docs.select(col("id"), col("shingles").as("items")), k, bands)
    // equi-join on id re-attaches the shingle payload to the signature —
    // the signatures travel the aggregation shuffle WITHOUT the payload
    docs.join(banded, Seq("id"))
  }

  /** Probe a corpus MinHash index ([[buildMinhashIndex]] rows, typically
    * read back from a persisted Delta table) with a batch's index rows:
    * band-key equi-join over (band, key, id) for candidates, exact
    * jaccard verification from the two frames' own stored shingle sets.
    * Nothing touches document text. Same-id pairs are excluded —
    * re-ingesting a known document is an exact match, not a near-dup
    * discovery. Output: (batch_id, corpus_id, jaccard ≥ threshold),
    * DIRECTIONAL from the batch's perspective. */
  def probeMinhashIndex(corpusIndex: DataFrame, batchIndex: DataFrame,
                        threshold: Double = 0.7): DataFrame = {
    val corpusBuckets = corpusIndex
      .select(col("id").as("corpus_id"), explode(col("bands")).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("corpus_id"))
    val batchKeys = batchIndex
      .select(col("id").as("batch_id"), explode(col("bands")).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("batch_id"))
    val candidates = batchKeys.join(corpusBuckets, Seq("band", "key"))
      .filter(col("batch_id") =!= col("corpus_id"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct()
    val gi = batchIndex.select(col("id").as("batch_id"),
      col("shingles").as("sh_i"))
    val gj = corpusIndex.select(col("id").as("corpus_id"),
      col("shingles").as("sh_j"))
    candidates.join(gi, Seq("batch_id")).join(gj, Seq("corpus_id"))
      .select(col("batch_id"), col("corpus_id"),
        SortedArrayJaccard(col("sh_i"), col("sh_j")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Near-duplicates of a NEW batch against an EXISTING corpus — the
    * one-shot composition of [[buildMinhashIndex]] (both sides) and
    * [[probeMinhashIndex]]. For the production nightly-ingest shape where
    * the corpus index is a persisted artifact, use
    * [[incrementalMinhashLshPersisted]] — this overload re-derives the
    * corpus index from text and exists for ad-hoc/one-off probes. */
  def incrementalMinhashLsh(corpus: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String,
                            shingleWidth: Int = 3, k: Int = 12,
                            bands: Int = 4,
                            threshold: Double = 0.7): DataFrame =
    probeMinhashIndex(
      buildMinhashIndex(corpus, idCol, textCol, shingleWidth, k, bands),
      buildMinhashIndex(batch, idCol, textCol, shingleWidth, k, bands),
      threshold)

  /** The nightly-batch entry point over a PERSISTED index: probes the
    * Delta index table at `indexPath` with the new batch's documents,
    * appends the batch's own index rows (one atomic Delta commit, so the
    * index is ready for the NEXT batch), and returns the matches. The
    * probe plans against the pre-append snapshot — Delta snapshots are
    * immutable file lists, so the append cannot leak the batch into its
    * own corpus side even though the returned frame is lazy.
    *
    * Scale: the only inputs are the batch text (small) and the index
    * table's (id, bands) / (id, shingles) column groups; cost tracks the
    * batch and its candidates, never the corpus. `idempotentTxn` makes
    * the append exactly-once under orchestrator retries (same
    * SetTransaction machinery as the streaming sink). */
  def incrementalMinhashLshPersisted(spark: org.apache.spark.sql.SparkSession,
                                     indexPath: String, batch: DataFrame,
                                     idCol: String, textCol: String,
                                     shingleWidth: Int = 3, k: Int = 12,
                                     bands: Int = 4, threshold: Double = 0.7,
                                     idempotentTxn: Option[(String, Long)] = None): DataFrame = {
    val batchIndex =
      buildMinhashIndex(batch, idCol, textCol, shingleWidth, k, bands)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusIndex = graft.delta.DeltaTable.forPath(spark, indexPath).toDF
    val result = probeMinhashIndex(corpusIndex, batchIndex, threshold)
    // the append materializes batchIndex into the cache (its one heavy
    // use); release it before returning — a streaming ingest calls this
    // once per micro-batch, and per-call cached leftovers would
    // accumulate for the life of the session. The lazy result re-derives
    // the batch side from lineage when consumed: batch-sized work by
    // definition, and the CORPUS side still reads only the stored index.
    graft.delta.DeltaTable.write(batchIndex, indexPath,
      org.apache.spark.sql.SaveMode.Append, idempotentTxn = idempotentTxn)
    batchIndex.unpersist(blocking = false)
    result
  }

  /** SimHash near-duplicate pairs: `bits`-wide simhash, banded into
    * `bands` contiguous bit slices; pairs sharing any band are verified by
    * full hamming distance ≤ `maxDistance`.
    *
    * The simhash itself is computed relationally — explode tokens, one
    * codegen'd signed vote SUM per bit, fold the votes into a long — the
    * same shape as one map-side-combined aggregation. Documents with no
    * tokens produce no hash (and so no pairs). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bits: Int = 60, bands: Int = 4,
                   maxDistance: Int = 8): DataFrame = {
    require(bits % bands == 0)
    val width = bits / bands
    val mask = (1L << width) - 1

    val toks = InputWidth.widen(df).select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("tk"))
      .select(col("id"), md5Hash60(col("tk")).as("h"))
    val voteCols = (0 until bits).map { i =>
      sum(shiftrightCol(col("h"), lit(i)).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$i")
    }
    val votes = toks.groupBy(col("id")).agg(voteCols.head, voteCols.tail: _*)
    // fold votes MSB-first: bit i of the text lands at position bits-1-i
    val hash = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc * 2 + when(col(s"v$i") > 0, 1L).otherwise(0L)
    }
    val hashed = votes.select(col("id"), hash.as("h"))

    val banded = hashed.select(col("id"), col("h"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightCol(col("h"), lit(b * width)).bitwiseAND(lit(mask)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("h"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("band"), col("key"), col("id").as("i"), col("h").as("h_i"))
    val r = banded.select(col("band"), col("key"), col("id").as("j"), col("h").as("h_j"))
    l.join(r, Seq("band", "key"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"), col("h_i"), col("h_j"))
      .distinct()
      .select(col("i"), col("j"),
        hammingDistance(col("h_i"), col("h_j")).as("hamming"))
      .filter(col("hamming") <= maxDistance)
  }

  /** Character-n-gram jaccard near-dup pairs via PREFIX FILTERING
    * (AllPairs / PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    * WWW'08): with grams ordered rarest-first by global document
    * frequency, two sets with jaccard ≥ t MUST share a gram within each
    * set's first `|G| - ⌈t·|G|⌉ + 1` grams, so candidates form only on
    * prefix grams — which the rarity order makes the LEAST common ones.
    * The filter is EXACT (100% recall): the output is every pair with
    * jaccard ≥ t, independent of blocking.
    *
    * Why not LSH banding here: char-n-gram sets of UNRELATED documents
    * overlap heavily (jaccard 0.3–0.5 is normal prose-vs-prose), so any
    * banding sharp enough to keep recall at t=0.8 admits a large share
    * of all pairs. Round 1's length buckets degenerated the same way
    * (most docs share a few popular length buckets → O(bucket²)).
    *
    * Shuffles: one groupBy over exploded grams (doc frequency), one
    * window by doc (rank grams), the prefix self-join keyed by gram, and
    * the verify joins. The size-ratio prune — jaccard(A,B) ≤
    * min(|A|,|B|)/max(|A|,|B|) — runs inside the candidate join on two
    * ints, before any gram array is attached; the verifier is the
    * codegen'd [[SortedArrayJaccard]]. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // the shingled corpus feeds TWO passes (gram frequencies, then the
    // interning join) — persist it so the parquet scan + shingling run
    // once, not twice; the frequency pass collects eagerly below, which
    // also materializes the cache before the second pass plans against it.
    // The CANDIDATE side of the prefix join inherits this partitioning
    // unchanged (broadcast joins add no shuffle), so a narrow input
    // would run the entire multi-million-pair probe in ONE task
    // ([[InputWidth.widen]]).
    val docs = InputWidth.widen(df)
      .select(col(idCol).as("id"),
        ShingleExpressions.charShinglesSorted(col(textCol), n).as("grams"))
      .filter(size(col("grams")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val (intDocs0, maxGid) = internRarestFirst(docs)
    val intDocs = intDocs0.withColumn("nG", size(col("gids")))
    // three EXACT per-pair prunes on ints, inside the candidate join:
    //  - pair ordering: the indexed side is the smaller set (ties by id),
    //    so each unordered pair forms exactly once;
    //  - size ratio: jaccard(A,B) <= min|..|/max|..|;
    //  - PPJoin positional filter: at a shared prefix gram with ranks
    //    (rk_x, rk_y), overlap <= min(nG_x-rk_x, nG_y-rk_y)+1, which must
    //    reach ceil(t/(1+t)·(nG_x+nG_y)); the FIRST common gram of a
    //    qualifying pair always passes, so keeping pairs with ANY
    //    passing match loses nothing.
    val smallerIndexed = (col("nG_y") < col("nG_x")) ||
      (col("nG_y") === col("nG_x") && col("y") < col("x"))
    val sizeOk = least(col("nG_x"), col("nG_y")).cast("double") /
      greatest(col("nG_x"), col("nG_y")) >= threshold
    val requiredOverlap =
      ceil(lit(threshold / (1.0 + threshold)) * (col("nG_x") + col("nG_y")))
    val positionOk =
      (least(col("nG_x") - col("rk_x"), col("nG_y") - col("rk_y")) + 1) >=
        requiredOverlap

    // Asymmetric prefixes (AllPairs/PPJoin indexing-prefix optimization,
    // still EXACT): every doc PROBES with its (nG - ceil(t·nG) + 1)
    // rarest grams, but is INDEXED by only (nG - ceil(2t/(1+t)·nG) + 1)
    // of them — for a qualifying pair with |y| ≤ |x|, the overlap bound
    // o ≥ 2t/(1+t)·|y| proves the FIRST common gram sits inside the
    // smaller side's SHORT prefix, so joining probe(larger) × index
    // (smaller) loses nothing and nearly halves one join side at t=0.8.
    // Leading slices, because gids is sorted in the global rarity order.
    val probeLen = col("nG") - ceil(col("nG") * threshold) + 1
    val indexLen = col("nG") -
      ceil(col("nG") * (2.0 * threshold / (1.0 + threshold))) + 1

    if (maxGid <= BitsetGramUniverseMax) {
      // Small-universe representation: every gram set fits in a fixed
      // (maxGid>>6)+1-long bitset, so jaccard is popcount(AND)/popcount
      // (OR) — the same double [[SortedArrayJaccard]] produces on the id
      // arrays. Because the payload is UNIVERSE-bounded (not document-
      // bounded) it rides through the prefix join itself: verification
      // happens inside the candidate join and the survivor stream needs
      // no distinct-then-re-attach round trip. A tiny gram alphabet is
      // exactly the regime where prefix filtering degenerates toward
      // all-pairs (candidate volume ~ every pair several times over), so
      // the per-candidate savings apply at the worst possible volume.
      val words = (maxGid >> 6) + 1
      val bitDocs = intDocs.withColumn("bits",
        IntArrayBitset(col("gids"), words))
      def prefixRows(len: org.apache.spark.sql.Column) =
        bitDocs.select(col("id"), col("nG"), col("bits"),
          posexplode(slice(col("gids"), lit(1), len.cast("int"))))
      prefixRows(probeLen)
        .select(col("col").as("g"), col("id").as("x"),
          col("nG").as("nG_x"), (col("pos") + 1).as("rk_x"),
          col("bits").as("b_x"))
        .join(prefixRows(indexLen)
          .select(col("col").as("g"), col("id").as("y"),
            col("nG").as("nG_y"), (col("pos") + 1).as("rk_y"),
            col("bits").as("b_y")), Seq("g"))
        .filter(smallerIndexed && sizeOk && positionOk)
        .select(least(col("x"), col("y")).as("i"),
          greatest(col("x"), col("y")).as("j"),
          BitsetJaccard(col("b_x"), col("b_y")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
        .distinct()
    } else {
      def prefixRows(len: org.apache.spark.sql.Column) =
        intDocs.select(col("id"), col("nG"),
          posexplode(slice(col("gids"), lit(1), len.cast("int"))))
      val candidates = prefixRows(probeLen)
        .select(col("col").as("g"), col("id").as("x"),
          col("nG").as("nG_x"), (col("pos") + 1).as("rk_x"))
        .join(prefixRows(indexLen)
          .select(col("col").as("g"), col("id").as("y"),
            col("nG").as("nG_y"), (col("pos") + 1).as("rk_y")), Seq("g"))
        .filter(smallerIndexed && sizeOk && positionOk)
        .select(least(col("x"), col("y")).as("i"),
          greatest(col("x"), col("y")).as("j"))
        .distinct()

      // verification on the compact int arrays: bijective with the gram
      // sets, so the jaccard value is exactly the gram-set jaccard
      val gi = intDocs.select(col("id").as("i"), col("gids").as("g_i"))
      val gj = intDocs.select(col("id").as("j"), col("gids").as("g_j"))
      candidates.join(gi, Seq("i")).join(gj, Seq("j"))
        .select(col("i"), col("j"),
          SortedArrayJaccard(col("g_i"), col("g_j")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }

  /** Intern a shingled corpus's grams to dense int ids ranked
    * rarest-first: the id IS the global prefix order, so per-doc rarity
    * sorts collapse into one int sort, and every downstream structure
    * (prefix rows, verify payloads) carries 4-byte ints instead of gram
    * strings. Input must have columns (id, grams: sorted string array);
    * returns (df(id, gids: sorted int array), gram-universe size).
    *
    * Char-n-grams come from a bounded alphabet, so the id table is
    * usually driver-sized — but that is an assumption about the CALLER's
    * gram regime, not a property of this operator. A word-5-gram corpus
    * has billions of distinct grams; collecting them would OOM the
    * driver and ship the dictionary inside every task closure. Guard
    * with an explicit bound (same architecture as cc.driverMaxEdges):
    * under it, the fast driver-dictionary interning; over it, a fully
    * distributed sort + per-partition-offset ranking. */
  private[operators] def internRarestFirst(docs: DataFrame)
      : (DataFrame, Int) = {
    val freq = docs.select(explode(col("grams")).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nGrams = freq.count()
    val dictBound = docs.sparkSession.conf
      .getOption("spark.graft.dedup.maxGramDict").map(_.toLong)
      .getOrElse(DefaultMaxGramDict)
    if (nGrams <= dictBound) {
      // Rank grams rarest-first WITHOUT a global window: a partition-less
      // row_number would sort every distinct gram in ONE executor task
      // (the round-2 bench's "No Partition Defined" warning). Collect the
      // (gram, df) pairs once and sort on the driver; per-doc interning
      // is then a LOOKUP against the driver dictionary
      // ([[InternSortedIds]], shipped in the task closure) — not an
      // explode → join → re-group round trip that would shuffle every
      // gram occurrence a second time just to rebuild the per-doc arrays.
      Dedup.lastGramInterning = "driver"
      val ranked = freq.select(col("s"), col("df")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .sortBy { case (s, d) => (d, s) }
      freq.unpersist(blocking = false)
      val dict = ranked.iterator.zipWithIndex
        .map { case ((s, _), i) => (s, i + 1) }.toMap
      (docs.select(col("id"), InternSortedIds(col("grams"), dict).as("gids")),
        ranked.length)
    } else {
      // Distributed fallback: the driver never sees a gram. The total
      // rarest-first order comes from a RANGE-PARTITIONED sort on
      // (df, gram) — the distributed TeraSort shape, no single-task
      // global window — and contiguous dense ids from per-partition
      // offsets (zipWithIndex: one small job for partition sizes).
      // Interning then joins the exploded grams with the id table and
      // regroups per doc — one extra shuffle of the gram occurrences,
      // the price of not materializing the dictionary anywhere. The
      // prefix filter stays EXACT: correctness needs only a consistent
      // total order of the gram universe; rarest-first remains the
      // candidate-minimizing heuristic.
      Dedup.lastGramInterning = "distributed"
      require(nGrams <= Int.MaxValue,
        s"gram universe ($nGrams) exceeds the int id space")
      val spark = docs.sparkSession
      // release the freq cache up front: this branch exists for the
      // cluster regime where executor loss is routine, so the id table
      // must stay RECOMPUTABLE from lineage (a localCheckpoint would pin
      // it to executor-local blocks and turn any lost executor into a
      // failed run; a kept cache would outlive the operator). The price
      // is re-running the gram aggregation from the cached docs when a
      // downstream stage pulls the data — determinism holds because the
      // sort's range boundaries are fixed in the partitioner at creation
      // and (df, gram) keys are distinct.
      freq.unpersist(blocking = false)
      val idRows = freq.sort(col("df"), col("s")).select(col("s")).rdd
        .zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(r.getString(0), (i + 1).toInt) }
      val gramIds = spark.createDataFrame(idRows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("s",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("gid",
            org.apache.spark.sql.types.IntegerType, nullable = false))))
      val interned = docs.select(col("id"), explode(col("grams")).as("s"))
        .join(gramIds, Seq("s"))
        .groupBy(col("id"))
        .agg(sort_array(collect_list(col("gid"))).as("gids"))
      (interned, nGrams.toInt)
    }
  }

  /** Directed containment near-dup pairs: (contained, container) where
    * C(A→B) = |grams(A) ∩ grams(B)| / |grams(A)| ≥ `threshold` and
    * A ≠ B — the asymmetric case Jaccard misses entirely: a short
    * document embedded verbatim in a much longer one (quote
    * aggregators, mirror pages with added boilerplate) has high
    * containment but Jaccard ≈ |A|/|B| → 0. WORD-`n`-gram sets — unlike
    * [[ngramJaccard]]'s char shingles, whose bounded alphabet saturates:
    * every long document "contains" every short one at the char-trigram
    * level, while word-gram containment requires shared phrasing.
    *
    * Returns (contained_id, container_id, inter_cnt, n_a, containment);
    * inter_cnt/n_a are exact ints, containment their IEEE quotient.
    *
    * Blocking is the AllPairs prefix filter adapted to containment —
    * EXACT (100% recall): overlap ≥ ⌈t·|A|⌉ forces at least one of A's
    * first |A| − ⌈t·|A|⌉ + 1 grams (in ANY fixed global order; rarity
    * order minimizes candidates) to appear in B, so A probes with its
    * rarest prefix. No size bound exists on the container, so B indexes
    * ALL its grams — containment's price relative to Jaccard's
    * symmetric-prefix join; the indexed rows still carry only
    * (gram id, doc id, size, rank) ints. Two exact per-candidate prunes
    * run inside the join, before any array attaches: |B| ≥ ⌈t·|A|⌉
    * (overlap ≤ min sizes) and the positional bound
    * min(|A|−rk_a, |B|−rk_b) + 1 ≥ ⌈t·|A|⌉. Verification is one
    * array_intersect on the interned int arrays of surviving pairs. */
  def ngramContainment(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val docs = InputWidth.widen(df)
      .select(col(idCol).as("id"),
        ShingleExpressions.wordShinglesSorted(
          tokens(col(textCol)), n).as("grams"))
      .filter(size(col("grams")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (intDocs0, _) = internRarestFirst(docs)
    // interned docs feed three passes (probe, index, verify attach):
    // persist like ngramJaccard's docs cache (LRU-evicted, recomputable)
    val intDocs = intDocs0.withColumn("nG", size(col("gids")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ⌈t·|A|⌉ via the SAME double multiply on both engines (the oracle
    // casts t to DOUBLE): the threshold decision must be bit-exact
    val need = (c: Column) => ceil(lit(threshold) * c)
    val probe = intDocs
      .select(col("id").as("a"), col("nG").as("n_a"),
        posexplode(slice(col("gids"), lit(1),
          (col("nG") - need(col("nG")) + 1).cast("int"))))
      .select(col("col").as("g"), col("a"), col("n_a"),
        (col("pos") + 1).as("rk_a"))
    val index = intDocs
      .select(col("id").as("b"), col("nG").as("n_b"),
        posexplode(col("gids")))
      .select(col("col").as("g"), col("b"), col("n_b"),
        (col("pos") + 1).as("rk_b"))
    val candidates = probe.join(index, Seq("g"))
      .filter(col("a") =!= col("b") &&
        col("n_b") >= need(col("n_a")) &&
        (least(col("n_a") - col("rk_a"), col("n_b") - col("rk_b")) + 1) >=
          need(col("n_a")))
      .select(col("a"), col("b")).distinct()

    val ga = intDocs.select(col("id").as("a"), col("gids").as("g_a"))
    val gb = intDocs.select(col("id").as("b"), col("gids").as("g_b"))
    candidates.join(ga, Seq("a")).join(gb, Seq("b"))
      .select(col("a").as("contained_id"), col("b").as("container_id"),
        size(array_intersect(col("g_a"), col("g_b"))).as("inter_cnt"),
        size(col("g_a")).as("n_a"))
      .filter(col("inter_cnt") >= need(col("n_a")))
      .withColumn("containment",
        col("inter_cnt").cast("double") / col("n_a").cast("double"))
  }

  /** Gram-universe bound for the bitset verification representation of
    * [[ngramJaccard]]: 4096 interned ids → at most 65 longs (520 B) of
    * payload per prefix row. Above this, document int arrays are the
    * smaller representation and the distinct-then-attach plan wins. */
  private val BitsetGramUniverseMax = 4096

  /** Default for `spark.graft.dedup.maxGramDict`: the largest gram
    * universe interned via a driver-collected dictionary (4M entries ≈
    * low hundreds of MB with map overhead — char-gram regimes sit far
    * under it, word-gram corpora far over). */
  private val DefaultMaxGramDict = 4L << 20

  /** Observability for specs (cf. Snapshot.filesMaterialized): which
    * interning strategy the last [[ngramJaccard]] call chose —
    * "driver" (bounded dictionary collect) or "distributed" (sorted
    * zipWithIndex ranking, dictionary never materialized). */
  @volatile private[graft] var lastGramInterning: String = ""

  /** Connected components over a near-duplicate pair set: every node gets
    * the minimum id reachable through the pairs as its `cluster` label —
    * turning pairwise matches into dedup GROUPS (keep one representative
    * per cluster, drop the rest).
    *
    * Algorithm: iterated min-label propagation WITH pointer jumping.
    * Each round, every node's label becomes the min of its own and its
    * neighbors' labels (one join + one groupBy), then every label
    * follows ITSELF one hop (`lbl(v) ← min(lbl(v), lbl(lbl(v)))`, a
    * self-join on the label table) — the pointer-jumping step halves
    * any remaining label-chain, so convergence is O(log diameter)
    * rounds, not O(diameter): a 2^50-link chain fits the default round
    * budget (the Shiloach–Vishkin hybrid; Kiveris et al.'s
    * star-contraction reaches the same bound with a different shape).
    * Near-duplicate graphs are unions of small dense clusters
    * (diameter 2–4 in practice), so the round count is tiny and
    * INDEPENDENT of corpus size; each round's shuffles carry only
    * (id, label) pairs — never document payloads. The jump preserves
    * the invariant that lbl(v) names a node in v's own component, so
    * the fixpoint is exactly the component minimum.
    *
    * `pairs` must have two id columns `i`, `j`. Returns (id, cluster). */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("i").as("a"), col("j").as("b"))
      .unionByName(pairs.select(col("j").as("a"), col("i").as("b")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Driver/executor split, same architecture as the snapshot state
    // bound: a pair set under ~1M edges is two longs per edge — union-
    // find on the driver beats N Spark rounds of join+aggregate overhead
    // by orders of magnitude. Above the bound (the 100 TB regime), the
    // iterated min-label propagation below keeps everything distributed.
    val maxDriverEdges = spark.conf.getOption("spark.graft.cc.driverMaxEdges")
      .map(_.toLong).getOrElse(1L << 20)
    val edgeCount = edges.count()
    if (edgeCount <= maxDriverEdges) {
      val rows = edges.collect()
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      // attach the larger root under the smaller so every component's
      // root IS its minimum — the distributed fold's exact contract
      def lt(x: Any, y: Any): Boolean = (x, y) match {
        case (a: Long, b: Long) => a < b
        case (a: Int, b: Int) => a < b
        case (a: String, b: String) => a < b
        case _ => x.toString < y.toString
      }
      rows.foreach { r =>
        val (rx, ry) = (find(r.get(0)), find(r.get(1)))
        if (rx != ry) { if (lt(rx, ry)) parent(ry) = rx else parent(rx) = ry }
      }
      val nodes = rows.iterator.flatMap(r => Iterator(r.get(0), r.get(1)))
        .toArray.distinct
      val out = nodes.map(n => org.apache.spark.sql.Row(n, find(n)))
      val idType = edges.schema("a").dataType
      edges.unpersist(blocking = false)
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("cluster", idType))))
    }

    var labels = edges.select(col("a").as("id"))
      .distinct()
      .withColumn("cluster", col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // neighbor labels: edge (a,b) proposes b's current label to a
      val proposals = edges
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("cluster")).as("nbr"))
      // localCheckpoint, not persist: persist caches DATA but the logical
      // plan still nests one join deeper per round — by round ~10 the
      // plan string alone is gigabytes and every action spends minutes
      // stringifying it for the UI. Checkpointing truncates both the
      // plan and the RDD lineage to a leaf; executor-loss recomputation
      // of an iterative label table is not meaningful anyway (any loss
      // restarts the algorithm, the GraphFrames trade-off).
      val propagated = labels.join(proposals, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr"), col("cluster")))
            .as("cluster"))
        .localCheckpoint()
      // pointer jump: follow the label ONE hop through the label table
      // itself — chains of stale labels halve every round, so long-
      // diameter components (containment chains, adversarial graphs)
      // converge in O(log diameter) rounds instead of aborting at the
      // round budget. Roots (cluster = id) jump to themselves.
      val next = propagated.join(
          propagated.select(col("id").as("cluster"),
            col("cluster").as("jump")),
          Seq("cluster"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("jump"), col("cluster")))
            .as("cluster"))
        .localCheckpoint()
      // localCheckpoint is eager: next is materialized, the intermediate
      // propagated table's blocks can go
      propagated.unpersist(blocking = false)
      // convergence check: any node whose label still shrinks? One count
      // per round on (id, label)-sized frames — no payloads, no collect
      // of the label table itself.
      val changed = next.join(labels.withColumnRenamed("cluster", "prev"),
          Seq("id"))
        .filter(col("cluster") < col("prev"))
        .limit(1).count()
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0
      round += 1
    }
    edges.unpersist(blocking = false)
    // silent non-convergence would split one duplicate group into
    // several "clusters" — fail loudly instead (raise maxRounds, or
    // switch to large-star/small-star contraction for such graphs)
    require(converged,
      s"connectedComponents did not converge within $maxRounds rounds " +
        "(component diameter exceeds the round budget)")
    labels
  }

  /** Quality-aware keep policy over near-dup clusters (the
    * RefinedWeb/FineWeb canonicalization step): within each duplicate
    * cluster keep the single best document — highest `scoreCol`, ties to
    * the lowest id — and every singleton keeps itself. Returns the kept
    * rows of `docs`, full schema.
    *
    * Plan shape: the winner per cluster is one `max(struct(score, -id))`
    * aggregation — map-side-combinable, cluster-count-sized output — NOT
    * a window rank, which would sort every cluster's rows inside a
    * per-partition sort; the kept set then applies as a semi-join on ids.
    * Only (id, cluster, score) triples ride the shuffles; document text
    * never does. NaN scores are rejected up front (NaN orders ABOVE every
    * real double in Spark's struct comparison, which would silently crown
    * a corrupt row the canonical one). */
  def keepCanonical(docs: DataFrame, idCol: String, pairs: DataFrame,
                    scoreCol: String): DataFrame = {
    // integral only: the tie-break orders by the NEGATED id, and negation
    // (or a cast to long) on fractional/decimal ids silently truncates —
    // the semi-join would then keep the wrong row or drop a whole cluster
    require(docs.schema(idCol).dataType match {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => true
        case _ => false
      },
      s"keepCanonical needs an integral id column for the tie-break " +
        s"(got ${docs.schema(idCol).dataType.simpleString})")
    val clusters = connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
      .withColumnRenamed("cluster", "__cc_cluster")
    val scored = docs
      // null score ranks WORST (below every real value): an unscored row
      // must never beat a scored one, and an all-null cluster still picks
      // its lowest id deterministically
      .select(col(idCol), coalesce(col(scoreCol).cast("double"),
        lit(Double.NegativeInfinity)).as("__score"))
      .join(clusters, Seq(idCol), "left")
      .withColumn("__cc_cluster", coalesce(col("__cc_cluster"), col(idCol)))
    val winners = scored
      .withColumn("__score", when(isnan(col("__score")),
        raise_error(lit(s"keepCanonical: NaN in score column $scoreCol")))
        .otherwise(col("__score")))
      // the winner's id rides the struct VERBATIM as a third field (it
      // never decides the max — equal (score, negid) implies equal id),
      // so the kept id is never reconstructed from the negated value
      .groupBy(col("__cc_cluster"))
      .agg(max(struct(col("__score"), negate(col(idCol).cast("long"))
        .as("negid"), col(idCol).as("id"))).as("w"))
      .select(col("w.id").as(idCol))
    docs.join(winners, Seq(idCol), "left_semi")
  }

  /** Embedding near-duplicate pairs above a cosine threshold, blocked by a
    * shared coarse key to avoid the all-pairs product at scale. Pairs join
    * on (block, id) alone; vectors are attached to the candidate pairs
    * afterwards.
    *
    * `blockCol` defaults to the engine's own LSH sign-bucket
    * ([[Similarity.lshBucket]], codegen'd) — callers without a natural
    * cluster key are NOT handed an all-pairs join; a caller-supplied key
    * (e.g. a label or IVF cell) overrides it. */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, dim: Int,
                           planes: Int): DataFrame =
    embeddingCosinePairs(df, idCol, vecCol,
      Similarity.lshBucket(col(vecCol), dim, planes), threshold)

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al.,
    * arXiv:2303.09540): k-means-cluster the embedding space and compare
    * pairs ONLY within a cluster — the trained cluster is the blocking
    * key, so the candidate volume tracks cluster sizes instead of
    * O(docs²), and (unlike the sign-bucket blocker) the blocks adapt to
    * the data's actual density. Returns (i, j, cosine ≥ threshold)
    * within-cluster pairs; compose with [[connectedComponents]] to pick
    * per-group representatives.
    *
    * Scale shape: centroids are broadcast-small, training is
    * [[Similarity.trainedCentroids]]'s bounded Lloyd loop, assignment is
    * one map-side-combinable aggregation, the pair join carries only
    * (cell, id), and vectors re-attach to surviving candidates. The
    * known SemDeDup caveat applies: near-dups straddling a cluster
    * boundary are not compared (raise nCells quality via `trainIters`,
    * or lower nCells, to trade recall against candidate volume). */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
                    nCells: Int = 16, trainIters: Int = 2,
                    threshold: Double = 0.9): DataFrame = {
    val c = Similarity.corpusFace(df, idCol, vecCol)
    val meta = semanticAssignments(df, c, idCol, vecCol, nCells, trainIters)
    val candidates = meta.select(col("cell"), col("id").as("i"))
      .join(meta.select(col("cell"), col("id").as("j")), Seq("cell"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"))
    val vi = c.select(col("neighbor_id").as("i"), col("cv0").as("v_i"),
      col("cn0").as("n_i"))
    val vj = c.select(col("neighbor_id").as("j"), col("cv0").as("v_j"),
      col("cn0").as("n_j"))
    candidates.join(vi, Seq("i")).join(vj, Seq("j"))
      .select(col("i"), col("j"),
        round(VectorDot(col("v_i"), col("v_j")) / (col("n_i") * col("n_j")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The (id, cell) blocking assignment behind [[semanticPairs]]: one
    * trained k-means partition of the corpus, then — because candidate
    * volume is Σ cell_size² and one degenerate giant cluster
    * (boilerplate-heavy corpora put 40% of documents in one cell) makes
    * the within-cell self-join quadratic in it — any cell over
    * `spark.graft.dedup.maxClusterSize` is recursively RE-CLUSTERED
    * in place: a grouped k-means runs inside every oversized cell at
    * once (all cells per pass, one plan), splitting each into up to
    * `nCells` sub-cells labelled `parent/child`, until every cell fits
    * or [[MaxSemanticSplitDepth]] is reached.
    *
    * Scale shape of a split pass: seeds are the min-id member of each
    * of `nCells` deterministic hash residue classes — a map-side-
    * combinable agg, never a per-cell window (an oversized cell is by
    * definition the thing that must not funnel through one task); Lloyd
    * iterations are the same broadcast-join + argmax + (cell, dim)-mean
    * shape as [[Similarity.trainCentroids]], keyed by cell so every
    * oversized cell trains simultaneously.
    *
    * Termination: a cell of IDENTICAL vectors cannot shrink (every
    * member ties to the same sub-centroid) — a child that keeps its
    * parent's exact size is frozen rather than re-split, and such cells
    * stay quadratic by necessity: all their pairs are true duplicates,
    * so the output itself is quadratic in them. Determinism: hash-class
    * seeding, 6-decimal rounding before every comparison, id tie-breaks
    * — re-runs reproduce bit-for-bit. */
  private[graft] def semanticAssignments(df: DataFrame, c: DataFrame,
                                         idCol: String, vecCol: String,
                                         nCells: Int,
                                         trainIters: Int): DataFrame = {
    val spark = df.sparkSession
    val cap = spark.conf.getOption("spark.graft.dedup.maxClusterSize")
      .map(_.toLong).getOrElse(DefaultMaxClusterSize)
    val cents = Similarity.trainedCentroids(df, c, idCol, vecCol,
      nCells, trainIters)
    var assign = Similarity.assignCells(c, cents)
      .select(col("neighbor_id").as("id"), col("cell").cast("string").as("cell"))
    lastSemanticSplitDepth = 0
    var depth = 0
    var prevOver = Map.empty[String, Long]
    var continue = cap > 0
    while (continue && depth < MaxSemanticSplitDepth) {
      // bounded collect: at most (#cells over cap) rows, itself bounded
      // by corpus_size / cap
      val over = assign.groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .filter(col("n") > cap).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // freeze children that kept their parent's exact size — the split
      // moved nothing (identical/tied vectors), so re-splitting would
      // loop to the depth bound doing no work
      val splittable = over.filterNot { case (label, n) =>
        val slash = label.lastIndexOf('/')
        slash >= 0 && prevOver.get(label.substring(0, slash)).contains(n)
      }
      if (splittable.isEmpty) continue = false
      else {
        // MATERIALIZE each split level (r16, the PageRank localCheckpoint
        // precedent — a lineage cut, not a result cache): `assign` is a
        // union of (anti-join of the previous level) + (a full grouped
        // k-means re-cluster), and it is EXECUTED once per level for the
        // size census plus once per downstream consumer — without the cut
        // level N re-runs every previous level's training each time,
        // quadratic re-execution in depth (SemanticCapSpec's 3-minute
        // test was exactly this). The checkpoint holds O(corpus) narrow
        // (id, cell) rows, recomputed from parquet on every invocation.
        assign = splitOversizedCells(c, assign, splittable.keys.toSeq.sorted,
          nCells, math.max(trainIters, 1)).localCheckpoint()
        prevOver = over
        depth += 1
        lastSemanticSplitDepth = depth
      }
    }
    assign.select(col("cell"), col("id"))
  }

  /** One grouped-k-means split pass over `over`-sized cells: every
    * listed cell re-clusters into up to `nSplit` sub-cells in a single
    * plan. See [[semanticAssignments]] for the scale rationale. */
  private def splitOversizedCells(c: DataFrame, assign: DataFrame,
                                  over: Seq[String], nSplit: Int,
                                  iters: Int): DataFrame = {
    val spark = c.sparkSession
    import spark.implicits._
    val overDf = over.toDF("cell")
    val members = c.select(col("neighbor_id").as("id"), col("cv0"), col("cn0"))
      .join(assign, Seq("id"))
      .join(broadcast(overDf), Seq("cell"))
    // seeds: the min-id member of each hash residue class — some classes
    // may be empty in tiny cells (fewer seeds, never zero: a non-empty
    // cell populates at least one class)
    val seeded = members
      .withColumn("scid", pmod(xxhash64(col("id").cast("string")), lit(nSplit))
        .cast("int"))
      .groupBy(col("cell"), col("scid"))
      .agg(min(struct(col("id"), col("cv0"), col("cn0"))).as("m"))
      .select(col("cell"), col("scid"),
        col("m.cv0").as("cv"), col("m.cn0").as("cn"))
    var cents = localizeSmall(seeded)
    for (_ <- 1 to iters) {
      val assigned = members.join(broadcast(cents), Seq("cell"))
        .select(col("cell"), col("id"), col("cv0"),
          round(VectorDot(col("cv0"), col("cv")) / (col("cn0") * col("cn")), 6)
            .as("aff"),
          col("scid"))
        .groupBy(col("cell"), col("id"))
        .agg(max(struct(col("aff"), (-col("scid")).as("neg"), col("scid")))
          .as("best"),
          first(col("cv0")).as("cv0"))
        .select(col("cell"), col("best.scid").as("scid"), col("cv0"))
      // same (cell, scid, dim)-keyed round(avg, 6) aggregation as always;
      // r16 moves the ARRAY ASSEMBLY to the driver (the trainCentroids
      // rationale: the second groupBy + collect_list exchange reshaped
      // O(cells × nSplit × dim) rows the driver collects right after).
      // Values bit-identical: same groups/avg/rounding, pos-ascending
      // assembly = array_sort's struct order, cn = the same ascending
      // Σ cv_i² accumulation VectorDot.eval ran.
      val meanRows = assigned
        .select(col("cell"), col("scid"), posexplode(col("cv0")))
        .groupBy(col("cell"), col("scid"), col("pos"))
        .agg(round(avg(col("col")), 6).as("v"))
        .collect()
      val centRows = meanRows
        .groupBy(r => (r.getString(0), r.getAs[Number]("scid").intValue))
        .toSeq
        .map { case ((cell, scid), rows) =>
          val cv = rows.sortBy(_.getAs[Number]("pos").intValue)
            .map(_.getAs[Number]("v").doubleValue).toIndexedSeq
          var acc = 0.0
          var i = 0
          while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
          org.apache.spark.sql.Row(cell, scid, cv, math.sqrt(acc))
        }
        .sortBy(r => (r.getString(0), r.getInt(1)))
      cents = spark.createDataFrame(
        spark.sparkContext.parallelize(centRows, 1), cents.schema)
    }
    val reassigned = members.join(broadcast(cents), Seq("cell"))
      .select(col("cell"), col("id"),
        round(VectorDot(col("cv0"), col("cv")) / (col("cn0") * col("cn")), 6)
          .as("aff"),
        col("scid"))
      .groupBy(col("cell"), col("id"))
      .agg(max(struct(col("aff"), (-col("scid")).as("neg"), col("scid")))
        .as("best"))
      .select(col("id"),
        concat(col("cell"), lit("/"), col("best.scid").cast("string"))
          .as("cell"))
    assign.join(broadcast(overDf), Seq("cell"), "left_anti")
      .unionByName(reassigned.select(col("id"), col("cell")))
  }

  /** Collect a bounded-small frame (per-cell sub-centroids: #oversized ×
    * nSplit rows) and restart its lineage from a local relation — the
    * [[Similarity.trainCentroids]] materialization rationale: each Lloyd
    * pass otherwise re-executes every previous pass per downstream
    * broadcast. */
  private def localizeSmall(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(df.collect().toIndexedSeq, 1), df.schema)
  }

  /** Default for `spark.graft.dedup.maxClusterSize`: with the default
    * 16-cell quantizer a cell at the bound self-joins into ≤ 10^10
    * candidate rows of (cell, id, id) — large but shuffle-partitionable;
    * an UNbounded 40%-of-corpus cell at 10^9 documents would be 1.6×10^17.
    * 0 disables the cap. */
  private val DefaultMaxClusterSize = 100000L

  /** Recursive split depth bound: cap^(1/depth) shrink per level makes 6
    * levels enough for any realistic skew; beyond it the residual cells
    * are frozen (documented contract: degenerate identical-vector cells
    * are inherently quadratic — in their OUTPUT, not just their work). */
  private val MaxSemanticSplitDepth = 6

  /** Observability for specs: how many recursive split passes the last
    * [[semanticAssignments]] ran. */
  @volatile private[graft] var lastSemanticSplitDepth: Int = 0

  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                           blockCol: Column, threshold: Double): DataFrame = {
    val vecs = InputWidth.widen(df).select(col(idCol).as("id"),
      col(vecCol).as("v"), blockCol.as("blk"))
    val meta = vecs.select(col("blk"), col("id"))
    val candidates = meta.select(col("blk"), col("id").as("i"))
      .join(meta.select(col("blk"), col("id").as("j")), Seq("blk"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"))
    val vi = vecs.select(col("id").as("i"), col("v").as("v_i"),
      sqrt(VectorDot(col("v"), col("v"))).as("n_i"))
    val vj = vecs.select(col("id").as("j"), col("v").as("v_j"),
      sqrt(VectorDot(col("v"), col("v"))).as("n_j"))
    candidates.join(vi, Seq("i")).join(vj, Seq("j"))
      .select(col("i"), col("j"),
        round(VectorDot(col("v_i"), col("v_j")) / (col("n_i") * col("n_j")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
