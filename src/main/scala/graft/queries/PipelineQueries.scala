package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions._
import graft.operators.{CorpusStats, Curation, Dedup, Search, Similarity}
import graft.multimodal.Multimodal

/** The large-scale training-data-pipeline operators (builder brief §extras):
  * deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding-cosine), similarity search (brute-force and LSH ANN), text
  * analysis (token stats, quality, language-ID, fingerprints), and the
  * multimodal binary plumbing — each verified against a DuckDB mirror of
  * the same algorithm.
  *
  * Oracle-determinism rules used throughout: integer-derived doubles
  * (count ratios) and left-fold float math are bit-identical across
  * engines; sums of doubles across rows go through DECIMAL; integer SUMs
  * get CAST(... AS BIGINT) (DuckDB widens to HUGEINT).
  */
object PipelineQueries {
  import Tables.t

  /** DuckDB fragment: first 8 hex chars of md5(expr) as BIGINT (mirror of
    * [[graft.functions.md5Hash32]]). */
  private def duckHash32(expr: String): String =
    s"list_reduce(list_transform(string_split(substr(md5($expr), 1, 8), ''), " +
      "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)"

  /** DuckDB fragment: first 15 hex chars of md5(expr) as BIGINT (60-bit,
    * mirror of [[graft.functions.md5Hash60]]). */
  private def duckHash60(expr: String): String =
    s"list_reduce(list_transform(string_split(substr(md5($expr), 1, 15), ''), " +
      "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)"

  /** DuckDB fragment: dot product of two DOUBLE[] lists, left-fold in
    * element order (mirror of [[graft.functions.dotProduct]]). */
  private def duckDot(a: String, b: String, dim: Int = 64): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, ${dim + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), " +
      "(x, y) -> x + y)"

  /** DuckDB CTE chain replaying the per-subspace PQ training + encoding
    * (m subspaces of `sub` dims, `ksub` centroids, 1 Lloyd iteration —
    * the [[Similarity.buildPqIndexFrames]] parameters): per subspace s it
    * defines `c1_$s` (trained codebook), `code_$s` (nid → code),
    * `lut_$s` (query ADC lookup) and `contrib_$s` (query × doc DECIMAL
    * contributions). Callers compose these with their own ranking or
    * summary tail. */
  private def pqOracleSubCtes(m: Int = 4, sub: Int = 16,
                              ksub: Int = 8,
                              trainCond: String = "TRUE"): String = {
    def lo(s: Int) = s * sub + 1
    def hi(s: Int) = (s + 1) * sub
    def sv(expr: String, s: Int) = s"$expr[${lo(s)}:${hi(s)}]"
    def dotS(a: String, b: String) = duckDot(a, b, sub)
    (0 until m).map { s =>
      s"""c0_$s AS (
          SELECT vec_id AS cid, list_transform(${sv("embedding", s)}, x -> x::DOUBLE) AS cv
          FROM embeddings WHERE $trainCond ORDER BY vec_id LIMIT $ksub
        ), a0_$s AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${dotS(sv("e.embedding", s), "c.cv")} /
                       (sqrt(${dotS(sv("e.embedding", s), sv("e.embedding", s))}) *
                        sqrt(${dotS("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, c0_$s c WHERE $trainCond
        ), s0_$s AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM a0_$s) t WHERE rn = 1
        ), c1_$s AS (
          SELECT cell AS cid, list(v ORDER BY i) AS cv FROM (
            SELECT a.cell, i, round(AVG(e.embedding[${s * sub} + i]::DOUBLE), 6) AS v
            FROM s0_$s a JOIN embeddings e ON e.vec_id = a.nid,
                 range(1, ${sub + 1}) t(i)
            GROUP BY a.cell, i) q
          GROUP BY cell
        ), af_$s AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${dotS(sv("e.embedding", s), "c.cv")} /
                       (sqrt(${dotS(sv("e.embedding", s), sv("e.embedding", s))}) *
                        sqrt(${dotS("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, c1_$s c
        ), code_$s AS (
          SELECT nid, cid AS code FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM af_$s) t WHERE rn = 1
        ), lut_$s AS (
          SELECT q.vec_id AS query_id, c.cid,
                 CAST(round(${dotS(sv("q.embedding", s), "c.cv")}, 6) AS DECIMAL(18,6)) AS d,
                 CAST(round(${dotS("c.cv", "c.cv")}, 6) AS DECIMAL(18,6)) AS cc
          FROM embeddings q, c1_$s c WHERE q.vec_id < 10
        ), contrib_$s AS (
          SELECT l.query_id, co.nid AS neighbor_id, l.d, l.cc
          FROM code_$s co JOIN lut_$s l ON l.cid = co.code
        )"""
    }.mkString(", ")
  }

  /** DuckDB CTE chain replaying [[graft.operators.Bpe.trainMerges]] for
    * `k` merges with the SAME bracket-string algorithm: `words` (weighted
    * dictionary), `s0` ([c][h][a][r] strings), then per rank i:
    * `best$i` (argmax pair, count-desc lexicographic tie-break) and `s$i`
    * (the merge applied via literal replace). */
  private def bpeOracleCtes(k: Int): String = {
    val steps = (1 to k).map { i =>
      raw"""syms$i AS (
          SELECT wc, string_split(trim(s, '[]'), '][') AS l FROM s${i - 1}),
        pairs$i AS (
          SELECT wc, l, unnest(range(1, len(l))) AS j FROM syms$i),
        best$i AS (
          SELECT l[j] AS a, l[j+1] AS b, CAST(SUM(wc) AS BIGINT) AS cnt
          FROM pairs$i GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1),
        s$i AS (
          SELECT word, wc,
                 replace(s, '[' || (SELECT a FROM best$i) || '][' ||
                            (SELECT b FROM best$i) || ']',
                         '[' || (SELECT a FROM best$i) ||
                           (SELECT b FROM best$i) || ']') AS s
          FROM s${i - 1})"""
    }.mkString(", ")
    raw"""words AS (
          SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wc FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
            FROM documents) t
          WHERE w <> '' GROUP BY w),
        s0 AS (
          SELECT word, wc,
                 '[' || array_to_string(list_transform(range(1, len(word) + 1),
                        i -> word[i:i]), '][') || ']' AS s
          FROM words), $steps"""
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "text_bpe_merges",
      (s, dir) => graft.operators.Bpe.trainMerges(
        t(s, dir, "documents"), "text", 3),
      Some(raw"""
        WITH ${bpeOracleCtes(3)}
        SELECT * FROM (
          SELECT 1 AS rank, a AS left_sym, b AS right_sym, a || b AS merged,
                 cnt AS pair_count FROM best1
          UNION ALL SELECT 2, a, b, a || b, cnt FROM best2
          UNION ALL SELECT 3, a, b, a || b, cnt FROM best3) u
        ORDER BY rank""")),

    QueryDef(
      "text_bpe_segment",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = graft.operators.Bpe.trainMerges(docs, "text", 3)
          .collect().sortBy(_.getInt(0))
          .map(r => (r.getString(1), r.getString(2))).toSeq
        graft.operators.Bpe.tokenStats(docs, "doc_id", "text", merges)
          .withColumnRenamed("id", "doc_id")
      },
      Some(raw"""
        WITH ${bpeOracleCtes(3)},
        docwords AS (
          SELECT doc_id, w FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
            FROM documents) t WHERE w <> ''),
        agg AS (
          SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
                 CAST(SUM(len(v.s) - len(replace(v.s, '[', '')))
                   AS BIGINT) AS n_tokens
          FROM docwords d JOIN s3 v ON v.word = d.w
          GROUP BY d.doc_id)
        SELECT doc.doc_id, COALESCE(a.n_words, 0) AS n_words,
               COALESCE(a.n_tokens, 0) AS n_tokens,
               CASE WHEN COALESCE(a.n_words, 0) > 0
                    THEN a.n_tokens::DOUBLE / a.n_words
                    ELSE 0.0 END AS avg_tokens_per_word
        FROM documents doc LEFT JOIN agg a USING (doc_id)""")),

    // ------------------------------------------------------- text analysis
    QueryDef(
      "text_token_stats",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"lang", tokenCount($"text").as("toks"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"toks".cast("long")).as("sum_tokens"),
               min($"toks").as("min_tokens"),
               max($"toks").as("max_tokens"))
      },
      Some(raw"""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS sum_tokens,
               MIN(len(regexp_split_to_array(trim(text), '\s+'))) AS min_tokens,
               MAX(len(regexp_split_to_array(trim(text), '\s+'))) AS max_tokens
        FROM documents GROUP BY lang""")),

    QueryDef(
      "text_bpe_token_stats",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"lang", bpeTokenCount($"text").as("toks"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"toks".cast("long")).as("sum_bpe_tokens"),
               max($"toks").as("max_bpe_tokens"))
      },
      Some(raw"""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS sum_bpe_tokens,
               MAX(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS max_bpe_tokens
        FROM documents GROUP BY lang""")),

    QueryDef(
      "text_quality_scores",
      (s, dir) => {
        import s.implicits._
        val toks = tokens($"text")
        val nTok = size(toks).cast("double")
        val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
        val stopRatio = stopwordCount($"text", Seq("the", "a")).cast("double") / nTok
        val charsPerTok = length(trim($"text")).cast("double") / nTok
        val score = distinctRatio * 0.5 + (lit(1.0) - stopRatio) * 0.25 +
          least(charsPerTok / 6.0, lit(1.0)) * 0.25
        t(s, dir, "documents")
          .select($"lang", score.as("score"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               count(when($"score" < 0.75, 1)).as("n_low_quality"),
               sum($"score".cast(DecimalType(18, 9))).cast("double").as("sum_score"))
      },
      Some(raw"""
        WITH scored AS (
          SELECT lang,
                 len(list_distinct(toks))::DOUBLE / len(toks) * 0.5
                 + (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a'))::DOUBLE / len(toks)) * 0.25
                 + LEAST(length(trim(text))::DOUBLE / len(toks) / 6.0, 1.0) * 0.25 AS score
          FROM (SELECT lang, text,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                FROM documents)
        )
        SELECT lang, COUNT(*) AS n_docs,
               COUNT(CASE WHEN score < 0.75 THEN 1 END) AS n_low_quality,
               CAST(SUM(CAST(score AS DECIMAL(18,9))) AS DOUBLE) AS sum_score
        FROM scored GROUP BY lang""")),

    QueryDef(
      "text_lang_id",
      (s, dir) => {
        import s.implicits._
        // relational reformulation of four stopwordCount() columns: those
        // re-tokenize the text once PER LANGUAGE and evaluate an
        // interpreted lambda per token — explode once instead and take
        // conditional counts in one map-side-combinable, codegen'd agg
        // keyed by doc (explode_outer keeps token-less docs: all counts
        // 0 → 'en', exactly the composed form's tie-break)
        val perDoc = t(s, dir, "documents")
          .select($"doc_id", $"lang",
            explode_outer(tokens(lower($"text"))).as("tk"))
          .groupBy($"doc_id", $"lang")
          .agg(count(when($"tk".isin("the", "a"), 1)).as("en"),
               count(when($"tk".isin("der", "die", "und"), 1)).as("de"),
               count(when($"tk".isin("el", "la", "y"), 1)).as("es"),
               count(when($"tk".isin("le", "les", "et"), 1)).as("fr"))
        val predicted =
          when($"en" >= $"de" && $"en" >= $"es" && $"en" >= $"fr", "en")
            .when($"de" >= $"es" && $"de" >= $"fr", "de")
            .when($"es" >= $"fr", "es")
            .otherwise("fr")
        perDoc.select($"lang", predicted.as("predicted"))
          .groupBy($"lang", $"predicted")
          .agg(count(lit(1)).as("n"))
      },
      Some(raw"""
        WITH counts AS (
          SELECT lang,
                 len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS en,
                 len(list_filter(toks, x -> x = 'der' OR x = 'die' OR x = 'und')) AS de,
                 len(list_filter(toks, x -> x = 'el' OR x = 'la' OR x = 'y')) AS es,
                 len(list_filter(toks, x -> x = 'le' OR x = 'les' OR x = 'et')) AS fr
          FROM (SELECT lang, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                FROM documents)
        )
        SELECT lang,
               CASE WHEN en >= de AND en >= es AND en >= fr THEN 'en'
                    WHEN de >= es AND de >= fr THEN 'de'
                    WHEN es >= fr THEN 'es'
                    ELSE 'fr' END AS predicted,
               COUNT(*) AS n
        FROM counts GROUP BY 1, 2""")),

    // Gopher-style repetition signals (Rae et al. 2021 §A1.1): duplicate-
    // word fraction and top-2-gram fraction per document. The Spark side
    // is one explode + two map-side-combinable aggregations keyed by doc
    // (no window, no UDF) — at 100 TB the per-(doc,gram) partial counts
    // combine before the shuffle, and nothing is ever per-corpus global.
    QueryDef(
      "text_repetition",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select($"doc_id", $"lang", tokens($"text").as("tk"))
          .select($"doc_id", $"lang",
            when(size($"tk") > 0,
              lit(1.0) - size(array_distinct($"tk")).cast("double")
                / size($"tk").cast("double")).otherwise(0.0).as("dupf"),
            when(size($"tk") >= 2,
              transform(sequence(lit(0), size($"tk") - 2),
                i => concat_ws(" ", slice($"tk", i + 1, lit(2)))))
              .otherwise(array().cast("array<string>")).as("grams"))
        val perGram = docs
          .select($"doc_id", $"lang", $"dupf", explode_outer($"grams").as("g"))
          .groupBy($"doc_id", $"lang", $"dupf", $"g")
          .agg(count(when($"g".isNotNull, 1)).as("c"))
        val perDoc = perGram.groupBy($"doc_id", $"lang", $"dupf")
          .agg(coalesce(max($"c").cast("double")
            / sum($"c").cast("double"), lit(0.0)).as("topf"))
        perDoc.groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"dupf".cast(DecimalType(18, 9))).cast("double")
                 .as("sum_dup_word_frac"),
               sum($"topf".cast(DecimalType(18, 9))).cast("double")
                 .as("sum_top2gram_frac"),
               count(when($"topf" > 0.2, 1)).as("n_repetitive"))
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id, lang,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
          FROM documents),
        g AS (
          SELECT doc_id, lang, tk,
                 CASE WHEN len(tk) >= 2
                      THEN list_transform(range(1, len(tk)),
                                          i -> tk[i] || ' ' || tk[i+1])
                      ELSE [] END AS grams
          FROM toks),
        per AS (
          SELECT doc_id, lang,
                 CASE WHEN len(tk) > 0
                      THEN 1.0 - len(list_distinct(tk))::DOUBLE / len(tk)
                      ELSE 0.0 END AS dupf,
                 CASE WHEN len(grams) = 0 THEN 0.0
                      ELSE list_max(list_transform(list_distinct(grams),
                             x -> len(list_filter(grams, y -> y = x))))::DOUBLE
                           / len(grams) END AS topf
          FROM g)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CAST(dupf AS DECIMAL(18,9))) AS DOUBLE) AS sum_dup_word_frac,
               CAST(SUM(CAST(topf AS DECIMAL(18,9))) AS DOUBLE) AS sum_top2gram_frac,
               COUNT(CASE WHEN topf > 0.2 THEN 1 END) AS n_repetitive
        FROM per GROUP BY lang""")),

    // CCNet-style corpus-LM quality proxy, exact-arithmetic variant: a
    // document's "typicality" is the mean CORPUS frequency of its tokens
    // (integer counts, one exact division — log-probabilities are not
    // bit-reproducible across engines, libm differs in the last ulp).
    // Scale shape: one explode, one (token)-keyed count (map-side
    // combinable), one token-keyed join back, one (doc)-keyed mean —
    // every stage partial-aggregates; nothing is per-corpus global but
    // the vocabulary itself.
    QueryDef(
      "text_unigram_typicality",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select($"doc_id", $"lang",
            explode(tokens(lower($"text"))).as("tk"))
        val counts = toks.groupBy($"tk").agg(count(lit(1)).as("cnt"))
        val perDoc = toks.join(counts, Seq("tk"))
          .groupBy($"doc_id", $"lang")
          .agg((sum($"cnt").cast("double") / count(lit(1)).cast("double"))
            .as("typ"))
        perDoc.groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"typ".cast(DecimalType(18, 9))).cast("double")
                 .as("sum_typicality"),
               count(when($"typ" < 50.0, 1)).as("n_atypical"))
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id, lang,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tk
          FROM documents WHERE length(trim(text)) > 0),
        counts AS (SELECT tk, COUNT(*) AS cnt FROM toks GROUP BY tk),
        per AS (
          SELECT doc_id, t.lang,
                 SUM(cnt)::DOUBLE / COUNT(*) AS typ
          FROM toks t JOIN counts USING (tk)
          GROUP BY doc_id, t.lang)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CAST(typ AS DECIMAL(18,9))) AS DOUBLE) AS sum_typicality,
               COUNT(CASE WHEN typ < 50.0 THEN 1 END) AS n_atypical
        FROM per GROUP BY lang""")),

    QueryDef(
      "text_fingerprint",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"source", rollingFingerprint($"text").as("fp"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
               countDistinct($"fp").as("n_distinct_fp"),
               min($"fp").as("min_fp"))
      },
      Some("""
        WITH fp AS (
          SELECT source,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007) AS fp
          FROM documents
        )
        SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_distinct_fp,
               MIN(fp) AS min_fp
        FROM fp GROUP BY source""")),

    // ------------------------------------------------------------- dedup
    QueryDef(
      "dedup_exact",
      (s, dir) => {
        import s.implicits._
        Dedup.exact(t(s, dir, "documents"), "doc_id", substring($"text", 1, 40))
      },
      Some("""
        SELECT md5(substr(text, 1, 40)) AS key, COUNT(*) AS group_size,
               MIN(doc_id) AS representative
        FROM documents GROUP BY 1 HAVING COUNT(*) > 1""")),

    QueryDef(
      "dedup_minhash_lsh",
      (s, dir) => Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
        shingleWidth = 3, k = 12, bands = 4, threshold = 0.7),
      Some("""
        WITH docs AS (
          SELECT doc_id AS id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks) - 1)]) AS shingles
          FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents)
          WHERE len(toks) >= 3
        ), mh AS (
          SELECT id, j, min(((2*j+1) * ${HASH32} + j*1000003) % 4294967311) AS m
          FROM (SELECT id, unnest(shingles) AS s FROM docs), range(0, 12) t(j)
          GROUP BY id, j
        ), bands AS (
          SELECT id, j // 3 AS band, string_agg(m, ',' ORDER BY j) AS key
          FROM mh GROUP BY id, j // 3
        ), cand AS (
          SELECT DISTINCT a.id AS i, b.id AS j
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.id < b.id
        )
        SELECT c.i, c.j,
               len(list_intersect(di.shingles, dj.shingles))::DOUBLE /
               (len(di.shingles) + len(dj.shingles)
                - len(list_intersect(di.shingles, dj.shingles))) AS jaccard
        FROM cand c JOIN docs di ON di.id = c.i JOIN docs dj ON dj.id = c.j
        WHERE len(list_intersect(di.shingles, dj.shingles))::DOUBLE /
              (len(di.shingles) + len(dj.shingles)
               - len(list_intersect(di.shingles, dj.shingles))) >= 0.7"""
        .replace("${HASH32}", duckHash32("s")))),

    // The one-time cost of the nightly-dedup artifact, timed and oracled
    // on its own (always builds FRESH — the shared IndexCache copy is
    // warmed outside Bench's timed region, so this entry is the build
    // number and dedup_incremental below is the pure probe number). The
    // summary reads the STORED table back, proving the artifact
    // round-trips through Delta.
    QueryDef(
      "dedup_index_build",
      (s, dir) => {
        import s.implicits._
        val idx = Tables.tmpDir("lshb")
        graft.delta.DeltaTable.write(
          Dedup.buildMinhashIndex(t(s, dir, "documents"), "doc_id", "text",
            shingleWidth = 3, k = 12, bands = 4),
          idx, org.apache.spark.sql.SaveMode.Overwrite)
        graft.delta.DeltaTable.forPath(s, idx).toDF
          .select(explode($"bands").as("bk"))
          .groupBy($"bk.band".as("band"))
          .agg(count(lit(1)).as("n_rows"), countDistinct($"bk.key").as("n_keys"))
      },
      Some("""
        WITH docs AS (
          SELECT doc_id AS id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks) - 1)]) AS shingles
          FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents)
          WHERE len(toks) >= 3
        ), mh AS (
          SELECT id, j, min(((2*j+1) * ${HASH32} + j*1000003) % 4294967311) AS m
          FROM (SELECT id, unnest(shingles) AS s FROM docs), range(0, 12) t(j)
          GROUP BY id, j
        ), bands AS (
          SELECT id, j // 3 AS band, string_agg(m, ',' ORDER BY j) AS key
          FROM mh GROUP BY id, j // 3
        )
        SELECT CAST(band AS INT) AS band, COUNT(*) AS n_rows,
               COUNT(DISTINCT key) AS n_keys
        FROM bands GROUP BY band"""
        .replace("${HASH32}", duckHash32("s")))),

    QueryDef(
      "dedup_incremental",
      (s, dir) => {
        import s.implicits._
        val corpus = t(s, dir, "documents")
        // the nightly batch: a slice of documents probing the corpus
        val batch = corpus.filter($"doc_id" % 7 === 0)
        // the production recurring shape: the corpus LSH index is a
        // PERSISTED Delta artifact (built once — IndexCache — and timed
        // separately as dedup_index_build); the batch probes the stored
        // index, with zero re-reads of the corpus text. The append half
        // of the nightly cycle (incrementalMinhashLshPersisted) is
        // spec-covered in IncrementalDedupIndexSpec; the oracled query
        // keeps the shared index immutable so no query can observe
        // another's appends.
        val corpusIndex = graft.delta.DeltaTable
          .forPath(s, IndexCache.minhashIndex(s, dir)).toDF
        val batchIndex = Dedup.buildMinhashIndex(batch, "doc_id", "text",
          shingleWidth = 3, k = 12, bands = 4)
        Dedup.probeMinhashIndex(corpusIndex, batchIndex, threshold = 0.7)
      },
      Some("""
        WITH docs AS (
          SELECT doc_id AS id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks) - 1)]) AS shingles
          FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents)
          WHERE len(toks) >= 3
        ), mh AS (
          SELECT id, j, min(((2*j+1) * ${HASH32} + j*1000003) % 4294967311) AS m
          FROM (SELECT id, unnest(shingles) AS s FROM docs), range(0, 12) t(j)
          GROUP BY id, j
        ), bands AS (
          SELECT id, j // 3 AS band, string_agg(m, ',' ORDER BY j) AS key
          FROM mh GROUP BY id, j // 3
        ), cand AS (
          SELECT DISTINCT a.id AS batch_id, b.id AS corpus_id
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.id <> b.id
          WHERE a.id % 7 = 0
        )
        SELECT c.batch_id, c.corpus_id,
               len(list_intersect(di.shingles, dj.shingles))::DOUBLE /
               (len(di.shingles) + len(dj.shingles)
                - len(list_intersect(di.shingles, dj.shingles))) AS jaccard
        FROM cand c
        JOIN docs di ON di.id = c.batch_id
        JOIN docs dj ON dj.id = c.corpus_id
        WHERE len(list_intersect(di.shingles, dj.shingles))::DOUBLE /
              (len(di.shingles) + len(dj.shingles)
               - len(list_intersect(di.shingles, dj.shingles))) >= 0.7"""
        .replace("${HASH32}", duckHash32("s")))),

    QueryDef(
      "dedup_simhash",
      (s, dir) => Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        bits = 60, bands = 4, maxDistance = 8),
      Some("""
        WITH th AS (
          SELECT doc_id AS id, ${HASH60} AS h
          FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tk
                FROM documents)
        ), bits AS (
          SELECT id, i,
                 CASE WHEN SUM(2 * ((h >> i) & 1) - 1) > 0
                      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
          FROM th, range(0, 60) t(i) GROUP BY id, i
        ), sim AS (
          SELECT id, CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(59 - i AS INT))) AS BIGINT) AS h
          FROM bits GROUP BY id
        ), banded AS (
          SELECT id, h, b, (h >> (b * 15)) & 32767 AS key
          FROM sim, range(0, 4) t(b)
        ), cand AS (
          SELECT DISTINCT a.id AS i, a.h AS h_i, b.id AS j, b.h AS h_j
          FROM banded a JOIN banded b
            ON a.b = b.b AND a.key = b.key AND a.id < b.id
        )
        SELECT i, j, CAST(bit_count(xor(h_i, h_j)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(h_i, h_j)) <= 8"""
        .replace("${HASH60}", duckHash60("tk")))),

    QueryDef(
      "dedup_ngram_jaccard",
      // prefix filtering is EXACT, so Spark and the oracle agree on the
      // final pair set even though each mirrors the blocker only for
      // its own runtime's sake (any global gram order yields the same
      // output: every pair with jaccard >= 0.8)
      (s, dir) => Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.8),
      Some("""
        WITH docs AS (
          SELECT doc_id AS id,
                 list_distinct([substr(text, i, 3)
                                for i in range(1, length(text) - 1)]) AS grams
          FROM documents WHERE length(text) >= 3
        ), ex AS (
          SELECT id, unnest(grams) AS s FROM docs
        ), freq AS (
          SELECT s, count(*) AS df FROM ex GROUP BY s
        ), ranked AS (
          SELECT e.id, e.s,
                 row_number() OVER (PARTITION BY e.id ORDER BY f.df, e.s) AS rk
          FROM ex e JOIN freq f ON e.s = f.s
        ), ng AS (
          SELECT id, len(grams) AS n FROM docs
        ), pref AS (
          SELECT r.id, r.s, g.n
          FROM ranked r JOIN ng g ON r.id = g.id
          WHERE r.rk <= g.n - ceil(0.8 * g.n) + 1
        ), cand AS (
          SELECT DISTINCT a.id AS i, b.id AS j
          FROM pref a JOIN pref b ON a.s = b.s AND a.id < b.id
          WHERE least(a.n, b.n)::DOUBLE / greatest(a.n, b.n) >= 0.8
        )
        SELECT c.i, c.j,
               len(list_intersect(di.grams, dj.grams))::DOUBLE /
               (len(di.grams) + len(dj.grams)
                - len(list_intersect(di.grams, dj.grams))) AS jaccard
        FROM cand c JOIN docs di ON di.id = c.i JOIN docs dj ON dj.id = c.j
        WHERE len(list_intersect(di.grams, dj.grams))::DOUBLE /
              (len(di.grams) + len(dj.grams)
               - len(list_intersect(di.grams, dj.grams))) >= 0.8""")),

    // Directed containment near-dup: the asymmetric case Jaccard misses
    // (short doc embedded verbatim in a long one). Both engines compute
    // the threshold ⌈t·|A|⌉ through the SAME IEEE double multiply (the
    // oracle casts 0.8 to DOUBLE — DuckDB's bare 0.8 literal is DECIMAL
    // and would round differently at exact boundaries); the prefix
    // blocker is exact, so each side may mirror it only for its own
    // runtime's sake.
    QueryDef(
      "dedup_containment",
      (s, dir) => Dedup.ngramContainment(t(s, dir, "documents"), "doc_id",
        "text", n = 3, threshold = 0.8),
      Some(raw"""
        WITH toks AS (
          SELECT doc_id AS id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
          FROM documents
        ), docs AS (
          SELECT id, list_distinct(
            CASE WHEN len(tk) >= 3
                 THEN list_transform(range(1, len(tk) - 1),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 ELSE [] END) AS grams
          FROM toks WHERE len(tk) >= 3
        ), ex AS (
          SELECT id, unnest(grams) AS s FROM docs
        ), freq AS (
          SELECT s, count(*) AS df FROM ex GROUP BY s
        ), ranked AS (
          SELECT e.id, e.s,
                 row_number() OVER (PARTITION BY e.id ORDER BY f.df, e.s) AS rk
          FROM ex e JOIN freq f ON e.s = f.s
        ), ng AS (
          SELECT id, len(grams) AS n FROM docs
        ), pref AS (
          SELECT r.id, r.s
          FROM ranked r JOIN ng g ON r.id = g.id
          WHERE r.rk <= g.n - ceil(CAST(0.8 AS DOUBLE) * g.n) + 1
        ), cand AS (
          SELECT DISTINCT a.id AS ca, b.id AS cb
          FROM pref a JOIN ranked b ON a.s = b.s AND a.id <> b.id
        )
        SELECT c.ca AS contained_id, c.cb AS container_id,
               len(list_intersect(da.grams, db.grams)) AS inter_cnt,
               len(da.grams) AS n_a,
               len(list_intersect(da.grams, db.grams))::DOUBLE
                 / len(da.grams) AS containment
        FROM cand c
        JOIN docs da ON da.id = c.ca
        JOIN docs db ON db.id = c.cb
        WHERE len(list_intersect(da.grams, db.grams))
                >= ceil(CAST(0.8 AS DOUBLE) * len(da.grams))""")),

    // Quality-aware canonical selection (the RefinedWeb keep policy):
    // within each near-dup cluster keep the BEST document — longest
    // (n_chars), ties to the lowest id — instead of dedup_pipeline's
    // min-id representative. Same proven MinHash+LSH cluster CTE as the
    // oracle; only the keep rule differs (rank by n_chars DESC, id ASC).
    QueryDef(
      "dedup_canonical",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
          shingleWidth = 3, k = 12, bands = 4, threshold = 0.7)
        Dedup.keepCanonical(docs, "doc_id", pairs, "n_chars")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"n_chars".cast("long")).as("sum_chars"),
               sum($"doc_id").as("sum_ids"))
      },
      Some("""
        WITH RECURSIVE docs AS (
          SELECT doc_id AS id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks) - 1)]) AS shingles
          FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents)
          WHERE len(toks) >= 3
        ), mh AS (
          SELECT id, j, min(((2*j+1) * ${HASH32} + j*1000003) % 4294967311) AS m
          FROM (SELECT id, unnest(shingles) AS s FROM docs), range(0, 12) t(j)
          GROUP BY id, j
        ), bands AS (
          SELECT id, j // 3 AS band, string_agg(m, ',' ORDER BY j) AS key
          FROM mh GROUP BY id, j // 3
        ), cand AS (
          SELECT DISTINCT a.id AS i, b.id AS j
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.id < b.id
        ), pairs AS (
          SELECT c.i, c.j
          FROM cand c JOIN docs di ON di.id = c.i JOIN docs dj ON dj.id = c.j
          WHERE len(list_intersect(di.shingles, dj.shingles))::DOUBLE /
                (len(di.shingles) + len(dj.shingles)
                 - len(list_intersect(di.shingles, dj.shingles))) >= 0.7
        ), edges AS (
          SELECT i AS a, j AS b FROM pairs UNION SELECT j AS a, i AS b FROM pairs
        ), reach(id, lbl) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.id = e.b
        ), labeled AS (
          SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id
        ), ranked AS (
          SELECT d.doc_id, l.cluster,
                 row_number() OVER (PARTITION BY l.cluster
                   ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
          FROM documents d JOIN labeled l ON d.doc_id = l.id
        ), dropped AS (
          SELECT doc_id FROM ranked WHERE rk > 1
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        GROUP BY lang"""
        .replace("${HASH32}", duckHash32("s")))),

    // Cross-document duplicated-n-gram fraction (MassiveText/RefinedWeb
    // corpus-level repetition signal): per document, the share of its
    // word-5-gram positions whose gram also occurs in another document —
    // catches boilerplate that whole-document dedup misses. One explode,
    // two gram-keyed aggregations, one gram-keyed join; text never rides
    // the wide shuffle.
    QueryDef(
      "dedup_cross_doc_ngrams",
      (s, dir) => Dedup.crossDocNgramDupFraction(
          t(s, dir, "documents"), "doc_id", "text", n = 5)
        .withColumnRenamed("id", "doc_id"),
      Some(raw"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
          FROM documents),
        grams AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(tk) >= 5
                        THEN list_transform(range(1, len(tk) - 3),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                  || ' ' || tk[i+3] || ' ' || tk[i+4])
                        ELSE [] END) AS g
          FROM toks),
        percount AS (
          SELECT doc_id, g, COUNT(*) AS cnt FROM grams GROUP BY doc_id, g),
        dfreq AS (SELECT g, COUNT(*) AS dfreq FROM percount GROUP BY g),
        agg AS (
          SELECT p.doc_id,
                 CAST(SUM(p.cnt) AS BIGINT) AS n_positions,
                 CAST(SUM(CASE WHEN d.dfreq >= 2 THEN p.cnt ELSE 0 END)
                      AS BIGINT) AS dup_positions
          FROM percount p JOIN dfreq d USING (g)
          GROUP BY p.doc_id)
        SELECT t.doc_id, COALESCE(a.n_positions, 0) AS n_positions,
               CASE WHEN COALESCE(a.n_positions, 0) > 0
                    THEN a.dup_positions::DOUBLE / a.n_positions
                    ELSE 0.0 END AS dup_frac
        FROM toks t LEFT JOIN agg a USING (doc_id)""")),

    QueryDef(
      "dedup_substring",
      (s, dir) => Dedup.exactSubstrStats(
          t(s, dir, "documents"), "doc_id", "text", minLen = 8)
        .withColumnRenamed("id", "doc_id"),
      Some(raw"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
          FROM documents),
        wins AS (
          SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+7], ' ') AS g
          FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
                FROM toks WHERE len(tk) >= 8)),
        occ AS (SELECT g FROM wins GROUP BY g HAVING COUNT(*) >= 2),
        dup AS (SELECT w.doc_id, w.pos FROM wins w JOIN occ o USING (g)),
        isl AS (
          SELECT doc_id, pos,
                 SUM(CASE WHEN pos - lag_pos <= 8 THEN 0 ELSE 1 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
          FROM (SELECT doc_id, pos,
                       LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         AS lag_pos FROM dup)),
        spans AS (
          SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 7 AS e
          FROM isl GROUP BY doc_id, island),
        agg AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
                 CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
          FROM spans GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.tk) AS INTEGER) AS n_tokens,
               COALESCE(a.n_spans, 0) AS n_spans,
               COALESCE(a.dup_tokens, 0) AS dup_tokens,
               CASE WHEN len(t.tk) > 0
                    THEN COALESCE(a.dup_tokens, 0)::DOUBLE / len(t.tk)
                    ELSE 0.0 END AS dup_frac
        FROM toks t LEFT JOIN agg a USING (doc_id)""")),

    QueryDef(
      "dedup_substring_strip",
      (s, dir) => Dedup.exactSubstrStrip(
          t(s, dir, "documents"), "doc_id", "text", minLen = 8)
        .withColumnRenamed("id", "doc_id"),
      Some(raw"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
          FROM documents),
        wins AS (
          SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+7], ' ') AS g
          FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
                FROM toks WHERE len(tk) >= 8)),
        occ AS (SELECT g FROM wins GROUP BY g HAVING COUNT(*) >= 2),
        dup AS (SELECT w.doc_id, w.pos FROM wins w JOIN occ o USING (g)),
        isl AS (
          SELECT doc_id, pos,
                 SUM(CASE WHEN pos - lag_pos <= 8 THEN 0 ELSE 1 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
          FROM (SELECT doc_id, pos,
                       LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         AS lag_pos FROM dup)),
        spans AS (
          SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 7 AS e
          FROM isl GROUP BY doc_id, island),
        kept AS (
          SELECT doc_id, tk[i] AS tok, i
          FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i
                FROM toks) t
          WHERE NOT EXISTS (SELECT 1 FROM spans s
                            WHERE s.doc_id = t.doc_id
                              AND i - 1 BETWEEN s.s AND s.e)),
        agg AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
                 CAST(COUNT(*) AS BIGINT) AS kept_tokens
          FROM kept GROUP BY doc_id)
        SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
               COALESCE(a.kept_tokens, 0) AS kept_tokens
        FROM toks t LEFT JOIN agg a USING (doc_id)""")),

    // Incremental ExactSubstr — the streaming-corpus shape: the corpus's
    // window counts persist once as a (h, occ) Delta artifact; a new
    // batch probes the stored counts (its window is duplicated iff
    // stored + in-batch occurrences reach minCount) and MERGEs its own
    // counts in, so the corpus text is never re-scanned. The verdicts
    // for the batch's documents are EXACTLY what the full recompute over
    // corpus ∪ batch would say (spec-proven), so the oracle is the full
    // chain restricted to the batch.
    QueryDef(
      "dedup_substr_incremental",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        // corpus-so-far counts warm once; the timed region is the
        // batch-sized work — clone, probe, merge — never a corpus re-scan
        val p = IndexCache.cloneIndex(s, IndexCache.substrIndex(s, dir), Nil)
        Dedup.incrementalSubstrSpans(s, p, docs.filter($"doc_id" % 10 === 0),
            "doc_id", "text", minLen = 8, minCount = 2)
          .withColumnRenamed("id", "doc_id")
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
          FROM documents),
        wins AS (
          SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+7], ' ') AS g
          FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
                FROM toks WHERE len(tk) >= 8)),
        occ AS (SELECT g FROM wins GROUP BY g HAVING COUNT(*) >= 2),
        dup AS (SELECT w.doc_id, w.pos FROM wins w JOIN occ o USING (g)
                WHERE w.doc_id % 10 = 0),
        isl AS (
          SELECT doc_id, pos,
                 SUM(CASE WHEN pos - lag_pos <= 8 THEN 0 ELSE 1 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
          FROM (SELECT doc_id, pos,
                       LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         AS lag_pos FROM dup))
        SELECT doc_id, CAST(MIN(pos) AS INTEGER) AS span_start,
               CAST(MAX(pos) + 7 AS INTEGER) AS span_end
        FROM isl GROUP BY doc_id, island""")),

    // Cross-set ExactSubstr decontamination: docs >= 50 are the corpus,
    // docs < 50 the "benchmark"; near-duplicate docs straddle the cut so
    // verbatim 8-token overlaps actually fire.
    QueryDef(
      "dedup_substr_contaminate",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        Dedup.exactSubstrContamination(
            docs.filter($"doc_id" >= 50), "doc_id", "text",
            docs.filter($"doc_id" < 50), "doc_id", "text", minLen = 8)
          .withColumnRenamed("id", "doc_id")
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
          FROM documents),
        cw AS (
          SELECT doc_id, array_to_string(tk[i:i+7], ' ') AS g
          FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
                FROM toks WHERE len(tk) >= 8 AND doc_id >= 50)),
        bw AS (
          SELECT DISTINCT array_to_string(tk[i:i+7], ' ') AS g
          FROM (SELECT tk, unnest(range(1, len(tk) - 6)) AS i
                FROM toks WHERE len(tk) >= 8 AND doc_id < 50)),
        hits AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS contaminated_windows
          FROM cw WHERE g IN (SELECT g FROM bw) GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(GREATEST(len(t.tk) - 7, 0) AS BIGINT) AS n_windows,
               COALESCE(h.contaminated_windows, 0) AS contaminated_windows,
               CASE WHEN len(t.tk) > 7
                    THEN COALESCE(h.contaminated_windows, 0)::DOUBLE /
                         (len(t.tk) - 7)
                    ELSE 0.0 END AS contaminated_frac
        FROM toks t LEFT JOIN hits h USING (doc_id)
        WHERE t.doc_id >= 50""")),

    // Decontamination through the PERSISTED benchmark-hash artifact: the
    // bench side hashes once into a Delta table (bench sets are fixed
    // while corpora stream), every corpus batch semi-joins the stored
    // hashes. Same answer as the ad-hoc operator, different plan — this
    // gates the artifact path end-to-end.
    QueryDef(
      "dedup_decontam_indexed",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val p = Tables.tmpDir("benchidx")
        Dedup.buildBenchWindowIndex(s, p, docs.filter($"doc_id" < 50),
          "doc_id", "text", minLen = 8)
        Dedup.substrContaminationIndexed(s, p, docs.filter($"doc_id" >= 50),
            "doc_id", "text", minLen = 8)
          .withColumnRenamed("id", "doc_id")
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
          FROM documents),
        cw AS (
          SELECT doc_id, array_to_string(tk[i:i+7], ' ') AS g
          FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
                FROM toks WHERE len(tk) >= 8 AND doc_id >= 50)),
        bw AS (
          SELECT DISTINCT array_to_string(tk[i:i+7], ' ') AS g
          FROM (SELECT tk, unnest(range(1, len(tk) - 6)) AS i
                FROM toks WHERE len(tk) >= 8 AND doc_id < 50)),
        hits AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS contaminated_windows
          FROM cw WHERE g IN (SELECT g FROM bw) GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(GREATEST(len(t.tk) - 7, 0) AS BIGINT) AS n_windows,
               COALESCE(h.contaminated_windows, 0) AS contaminated_windows,
               CASE WHEN len(t.tk) > 7
                    THEN COALESCE(h.contaminated_windows, 0)::DOUBLE /
                         (len(t.tk) - 7)
                    ELSE 0.0 END AS contaminated_frac
        FROM toks t LEFT JOIN hits h USING (doc_id)
        WHERE t.doc_id >= 50""")),

    // Feature-hashed linear scoring (fastText shape) with deterministic
    // pseudo-weights: integer weight sums, one division — bit-exact.
    QueryDef(
      "text_quality_hashed_lr",
      (s, dir) => Curation.hashedLinearScore(
          t(s, dir, "documents"), "doc_id", "text", dim = 64, salt = "q")
        .withColumnRenamed("id", "doc_id"),
      Some(raw"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
          FROM documents),
        buckets AS (
          SELECT doc_id,
                 ${duckHash32("'q' || ':' || tok")} % 64 AS b
          FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)),
        weights AS (
          SELECT doc_id,
                 ${duckHash32("'q:w' || ':' || CAST(b AS VARCHAR)")}
                   % 2001 - 1000 AS w
          FROM buckets),
        agg AS (
          SELECT doc_id, CAST(SUM(w) AS BIGINT) AS wsum
          FROM weights GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
               CASE WHEN len(t.tk) > 0
                    THEN COALESCE(a.wsum, 0)::DOUBLE /
                         (len(t.tk)::DOUBLE * 1000.0)
                    ELSE 0.0 END AS score
        FROM toks t LEFT JOIN agg a USING (doc_id)""")),

    // BPE vocabulary as a persisted artifact: train once into a Delta
    // table, segment FROM the artifact (training corpus never re-read at
    // serve time — the index-artifact pattern, one tier over).
    QueryDef(
      "text_bpe_artifact",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val vocab = graft.queries.Tables.tmpDir("bpevocab")
        graft.operators.Bpe.buildBpeVocab(docs, "text", 3, vocab)
        graft.operators.Bpe.tokenStatsFromVocab(s, vocab, docs,
          "doc_id", "text").withColumnRenamed("id", "doc_id")
      },
      Some(raw"""
        WITH ${bpeOracleCtes(3)},
        docwords AS (
          SELECT doc_id, w FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
            FROM documents) t WHERE w <> ''),
        agg AS (
          SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
                 CAST(SUM(len(v.s) - len(replace(v.s, '[', '')))
                   AS BIGINT) AS n_tokens
          FROM docwords d JOIN s3 v ON v.word = d.w
          GROUP BY d.doc_id)
        SELECT doc.doc_id, COALESCE(a.n_words, 0) AS n_words,
               COALESCE(a.n_tokens, 0) AS n_tokens,
               CASE WHEN COALESCE(a.n_words, 0) > 0
                    THEN a.n_tokens::DOUBLE / a.n_words
                    ELSE 0.0 END AS avg_tokens_per_word
        FROM documents doc LEFT JOIN agg a USING (doc_id)""")),

    QueryDef(
      "dedup_embedding_cosine",
      (s, dir) => {
        import s.implicits._
        Dedup.embeddingCosinePairs(t(s, dir, "embeddings"),
          "vec_id", "embedding", blockCol = $"label", threshold = 0.35)
      },
      Some(s"""
        WITH v AS (SELECT vec_id, label, embedding FROM embeddings)
        SELECT a.vec_id AS i, b.vec_id AS j,
               round(${duckDot("a.embedding", "b.embedding")} /
                     (sqrt(${duckDot("a.embedding", "a.embedding")}) *
                      sqrt(${duckDot("b.embedding", "b.embedding")})), 6) AS cosine
        FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(${duckDot("a.embedding", "b.embedding")} /
                    (sqrt(${duckDot("a.embedding", "a.embedding")}) *
                     sqrt(${duckDot("b.embedding", "b.embedding")})), 6) >= 0.35""")),

    QueryDef(
      "dedup_semantic",
      // SemDeDup: the blocking key is a TRAINED k-means cluster (2 Lloyd
      // iterations over the 16 lowest-id seeds) instead of a hash bucket
      // or a given label — blocks adapt to the data's density
      (s, dir) => Dedup.semanticPairs(t(s, dir, "embeddings"),
        "vec_id", "embedding", nCells = 16, trainIters = 2,
        threshold = 0.35),
      Some(s"""
        WITH cents0 AS (
          SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cv
          FROM embeddings ORDER BY vec_id LIMIT 16
        ), aff0 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, cents0 c
        ), assign0 AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM aff0) t WHERE rn = 1
        ), cents1 AS (
          SELECT cell AS cid, list(v ORDER BY i) AS cv FROM (
            SELECT a.cell, i, round(AVG(e.embedding[i]::DOUBLE), 6) AS v
            FROM assign0 a JOIN embeddings e ON e.vec_id = a.nid,
                 range(1, 65) t(i)
            GROUP BY a.cell, i) s
          GROUP BY cell
        ), aff1 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, cents1 c
        ), assign1 AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM aff1) t WHERE rn = 1
        ), cents2 AS (
          SELECT cell AS cid, list(v ORDER BY i) AS cv FROM (
            SELECT a.cell, i, round(AVG(e.embedding[i]::DOUBLE), 6) AS v
            FROM assign1 a JOIN embeddings e ON e.vec_id = a.nid,
                 range(1, 65) t(i)
            GROUP BY a.cell, i) s
          GROUP BY cell
        ), aff2 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, cents2 c
        ), assign AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM aff2) t WHERE rn = 1
        )
        SELECT a.nid AS i, b.nid AS j,
               round(${duckDot("ei.embedding", "ej.embedding")} /
                     (sqrt(${duckDot("ei.embedding", "ei.embedding")}) *
                      sqrt(${duckDot("ej.embedding", "ej.embedding")})), 6) AS cosine
        FROM assign a JOIN assign b ON a.cell = b.cell AND a.nid < b.nid
        JOIN embeddings ei ON ei.vec_id = a.nid
        JOIN embeddings ej ON ej.vec_id = b.nid
        WHERE round(${duckDot("ei.embedding", "ej.embedding")} /
                    (sqrt(${duckDot("ei.embedding", "ei.embedding")}) *
                     sqrt(${duckDot("ej.embedding", "ej.embedding")})), 6) >= 0.35""")),

    QueryDef(
      "curate_cluster_balance",
      // topic-balanced subsampling: trained k-means clusters as topic
      // blocks, each capped at 5 members (lowest ids) — over-represented
      // topics cannot dominate the mix. The oracle replays the identical
      // 2-iteration k-means chain and the per-cell rank in SQL.
      (s, dir) => Curation.clusterBalancedSample(t(s, dir, "embeddings"),
        "vec_id", "embedding", nCells = 16, trainIters = 2, perCellCap = 5),
      Some(s"""
        WITH cents0 AS (
          SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cv
          FROM embeddings ORDER BY vec_id LIMIT 16
        ), aff0 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, cents0 c
        ), assign0 AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM aff0) t WHERE rn = 1
        ), cents1 AS (
          SELECT cell AS cid, list(v ORDER BY i) AS cv FROM (
            SELECT a.cell, i, round(AVG(e.embedding[i]::DOUBLE), 6) AS v
            FROM assign0 a JOIN embeddings e ON e.vec_id = a.nid,
                 range(1, 65) t(i)
            GROUP BY a.cell, i) s
          GROUP BY cell
        ), aff1 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, cents1 c
        ), assign1 AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM aff1) t WHERE rn = 1
        ), cents2 AS (
          SELECT cell AS cid, list(v ORDER BY i) AS cv FROM (
            SELECT a.cell, i, round(AVG(e.embedding[i]::DOUBLE), 6) AS v
            FROM assign1 a JOIN embeddings e ON e.vec_id = a.nid,
                 range(1, 65) t(i)
            GROUP BY a.cell, i) s
          GROUP BY cell
        ), aff2 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, cents2 c
        ), assign AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM aff2) t WHERE rn = 1
        )
        SELECT nid AS vec_id, cell FROM (
          SELECT nid, cell,
                 ROW_NUMBER() OVER (PARTITION BY cell ORDER BY nid) AS rk
          FROM assign) r
        WHERE rk <= 5""")),

    QueryDef(
      "dedup_embedding_lsh",
      // the DEFAULT blocker: no caller-supplied block column — the engine
      // buckets by its own codegen'd LSH sign-bucket, so near-dup search
      // without a natural cluster key is never an all-pairs join
      (s, dir) => Dedup.embeddingCosinePairs(t(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.3, dim = 64, planes = 2),
      Some(s"""
        WITH dots AS (
          SELECT vec_id, embedding, j,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(range(1, 65), i ->
                     embedding[i]::DOUBLE *
                     CAST(((i - 1) * 31 + j * 17 + 7) % 7 - 3 AS DOUBLE))),
                   (x, y) -> x + y) AS dot
          FROM embeddings, range(0, 2) t(j)
        ), buckets AS (
          SELECT vec_id, any_value(embedding) AS embedding,
                 CAST(SUM(CASE WHEN dot >= 0
                   THEN CAST(1 AS BIGINT) << CAST(j AS INT)
                   ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id
        )
        SELECT a.vec_id AS i, b.vec_id AS j,
               round(${duckDot("a.embedding", "b.embedding")} /
                     (sqrt(${duckDot("a.embedding", "a.embedding")}) *
                      sqrt(${duckDot("b.embedding", "b.embedding")})), 6) AS cosine
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round(${duckDot("a.embedding", "b.embedding")} /
                    (sqrt(${duckDot("a.embedding", "a.embedding")}) *
                     sqrt(${duckDot("b.embedding", "b.embedding")})), 6) >= 0.3""")),

    // -------------------------------------------------- similarity search
    QueryDef(
      "ann_bruteforce_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 5)
      },
      Some(s"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        scored AS (
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 round(${duckDot("q.qv", "c.embedding")} /
                       (sqrt(${duckDot("q.qv", "q.qv")}) *
                        sqrt(${duckDot("c.embedding", "c.embedding")})), 6) AS cosine
          FROM embeddings c, q WHERE c.vec_id <> q.query_id
        ), ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        FROM ranked WHERE rank <= 5""")),

    QueryDef(
      "ann_lsh_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", dim = 64, k = 3, planes = 4)
      },
      Some(s"""
        WITH dots AS (
          SELECT vec_id, embedding, j,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(range(1, 65), i ->
                     embedding[i]::DOUBLE *
                     CAST(((i - 1) * 31 + j * 17 + 7) % 7 - 3 AS DOUBLE))),
                   (x, y) -> x + y) AS dot
          FROM embeddings, range(0, 4) t(j)
        ), buckets AS (
          SELECT vec_id, any_value(embedding) AS embedding,
                 CAST(SUM(CASE WHEN dot >= 0
                   THEN CAST(1 AS BIGINT) << CAST(j AS INT)
                   ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id
        ), q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
                 FROM buckets WHERE vec_id < 10),
        scored AS (
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 round(${duckDot("q.qv", "c.embedding")} /
                       (sqrt(${duckDot("q.qv", "q.qv")}) *
                        sqrt(${duckDot("c.embedding", "c.embedding")})), 6) AS cosine
          FROM buckets c JOIN q ON c.bucket = q.bucket
          WHERE c.vec_id <> q.query_id
        ), ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        FROM ranked WHERE rank <= 3""")),

    QueryDef(
      "ann_lsh_multiprobe_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(emb, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", dim = 64, k = 3, planes = 4,
          multiProbe = true)
      },
      Some(s"""
        WITH dots AS (
          SELECT vec_id, embedding, j,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(range(1, 65), i ->
                     embedding[i]::DOUBLE *
                     CAST(((i - 1) * 31 + j * 17 + 7) % 7 - 3 AS DOUBLE))),
                   (x, y) -> x + y) AS dot
          FROM embeddings, range(0, 4) t(j)
        ), buckets AS (
          SELECT vec_id, any_value(embedding) AS embedding,
                 CAST(SUM(CASE WHEN dot >= 0
                   THEN CAST(1 AS BIGINT) << CAST(j AS INT)
                   ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id
        ), q AS (
          SELECT vec_id AS query_id, embedding AS qv, bucket
          FROM buckets WHERE vec_id < 10
        ), probes AS (
          SELECT query_id, qv,
                 unnest(list_prepend(bucket,
                   [xor(bucket, CAST(1 AS BIGINT) << CAST(j AS INT))
                    for j in range(0, 4)])) AS bucket
          FROM q
        ), scored AS (
          SELECT p.query_id, c.vec_id AS neighbor_id,
                 round(${duckDot("p.qv", "c.embedding")} /
                       (sqrt(${duckDot("p.qv", "p.qv")}) *
                        sqrt(${duckDot("c.embedding", "c.embedding")})), 6) AS cosine
          FROM buckets c JOIN probes p ON c.bucket = p.bucket
          WHERE c.vec_id <> p.query_id
        ), ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        FROM ranked WHERE rank <= 3""")),

    QueryDef(
      "ann_ivf_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        // probes the PERSISTED IVF index (centroids + cell-partitioned
        // members); query time never trains or re-encodes the corpus
        Similarity.ivfTopKIndexed(s, IndexCache.ivfIndex(s, dir, 0),
          emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 3,
          nProbe = 4)
      },
      Some(s"""
        WITH cents AS (
          SELECT vec_id AS cid, embedding AS cv
          FROM embeddings ORDER BY vec_id LIMIT 16
        ), aff AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, cents c
        ), assign AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM aff) t WHERE rn = 1
        ), q AS (
          SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 10
        ), qaff AS (
          SELECT q.query_id, q.qv, c.cid,
                 round(${duckDot("q.qv", "c.cv")} /
                       (sqrt(${duckDot("q.qv", "q.qv")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM q, cents c
        ), qcells AS (
          SELECT query_id, qv, cid AS cell FROM (
            SELECT query_id, qv, cid, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM qaff) t WHERE rn <= 4
        ), scored AS (
          SELECT qc.query_id, e.vec_id AS neighbor_id,
                 round(${duckDot("qc.qv", "e.embedding")} /
                       (sqrt(${duckDot("qc.qv", "qc.qv")}) *
                        sqrt(${duckDot("e.embedding", "e.embedding")})), 6) AS cosine
          FROM qcells qc
          JOIN assign a ON a.cell = qc.cell
          JOIN embeddings e ON e.vec_id = a.nid
          WHERE e.vec_id <> qc.query_id
        ), ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        FROM ranked WHERE rank <= 3""")),

    QueryDef(
      "ann_pq_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        // exhaustive ADC over the PERSISTED PQ index: ranking reads the
        // int code table + broadcast codebooks; raw corpus vectors are
        // never scanned and the quantizers are never re-trained per call
        Similarity.pqTopKIndexed(s, IndexCache.pqIndex(s, dir),
          emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 3,
          dim = 64, m = 4)
      },
      // per-subspace k-means replayed in SQL (4 subspaces of 16 dims,
      // 8 centroids, 1 Lloyd iteration), then ADC scoring: DECIMAL-summed
      // contributions so the fold order cannot perturb the hash
      Some {
        s"""
        WITH ${pqOracleSubCtes()},
        qn AS (SELECT vec_id AS query_id,
                      sqrt(${duckDot("embedding", "embedding")}) AS qn
               FROM embeddings WHERE vec_id < 10),
        contrib AS (${(0 until 4).map(s => s"SELECT * FROM contrib_$s")
          .mkString(" UNION ALL ")}),
        scored AS (
          SELECT c.query_id, c.neighbor_id,
                 round(CAST(SUM(c.d) AS DOUBLE) /
                       (q.qn * sqrt(CAST(SUM(c.cc) AS DOUBLE))), 6) AS approx_cosine
          FROM contrib c JOIN qn q ON q.query_id = c.query_id
          WHERE c.neighbor_id <> c.query_id
          GROUP BY c.query_id, c.neighbor_id, q.qn
        ), ranked AS (
          SELECT query_id, neighbor_id, approx_cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY approx_cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, approx_cosine
        FROM ranked WHERE rank <= 3"""
      }),

    // PQ + REFINE (the FAISS refine tier): the index ranks an ADC
    // shortlist of k * 4; only those rows' raw vectors are scored
    // exactly and re-ranked — the standard answer to PQ's quantization
    // ceiling (recall bounds in QuantRecallSpec / NOTES). The oracle
    // replays the same PQ chain to the depth-12 shortlist, then the
    // exact rerank.
    QueryDef(
      "ann_pq_refined_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        Similarity.pqTopKRefinedIndexed(s, IndexCache.pqIndex(s, dir),
          emb, emb.filter($"vec_id" < 10), "vec_id", "embedding",
          k = 3, dim = 64, m = 4, shortlistFactor = 4)
      },
      Some {
        s"""
        WITH ${pqOracleSubCtes()},
        qn AS (SELECT vec_id AS query_id,
                      sqrt(${duckDot("embedding", "embedding")}) AS qn
               FROM embeddings WHERE vec_id < 10),
        contrib AS (${(0 until 4).map(s => s"SELECT * FROM contrib_$s")
          .mkString(" UNION ALL ")}),
        scored AS (
          SELECT c.query_id, c.neighbor_id,
                 round(CAST(SUM(c.d) AS DOUBLE) /
                       (q.qn * sqrt(CAST(SUM(c.cc) AS DOUBLE))), 6) AS approx_cosine
          FROM contrib c JOIN qn q ON q.query_id = c.query_id
          WHERE c.neighbor_id <> c.query_id
          GROUP BY c.query_id, c.neighbor_id, q.qn
        ), shortlist AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY approx_cosine DESC, neighbor_id ASC) AS rank
            FROM scored) t WHERE rank <= 12
        ), exact AS (
          SELECT s.query_id, s.neighbor_id,
                 round(${duckDot("q.embedding", "c.embedding")} /
                       (sqrt(${duckDot("q.embedding", "q.embedding")}) *
                        sqrt(${duckDot("c.embedding", "c.embedding")})), 6) AS cosine
          FROM shortlist s
          JOIN embeddings c ON c.vec_id = s.neighbor_id
          JOIN embeddings q ON q.vec_id = s.query_id
        ), rr AS (
          SELECT query_id, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM exact
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        FROM rr WHERE rank <= 3"""
      }),

    // IVFADC — the sub-linear ANN tier (FAISS IndexIVFPQ, no-residual
    // variant): coarse IVF prunes to nProbe cells, PQ/ADC scores only
    // those cells' codes. Probes the same persisted artifact as
    // ann_pq_topk; the oracle composes the coarse 1-iteration k-means
    // chain with the shared per-subspace PQ chains.
    QueryDef(
      "ann_ivfpq_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqTopKIndexed(s, IndexCache.pqIndex(s, dir),
          emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 3,
          dim = 64, m = 4, nProbe = 4)
      },
      Some {
        s"""
        WITH ${pqOracleSubCtes()},
        co0 AS (
          SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cv
          FROM embeddings ORDER BY vec_id LIMIT 16
        ), ca0 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, co0 c
        ), cs0 AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM ca0) t WHERE rn = 1
        ), co1 AS (
          SELECT cell AS cid, list(v ORDER BY i) AS cv FROM (
            SELECT a.cell, i, round(AVG(e.embedding[i]::DOUBLE), 6) AS v
            FROM cs0 a JOIN embeddings e ON e.vec_id = a.nid,
                 range(1, 65) t(i)
            GROUP BY a.cell, i) s
          GROUP BY cell
        ), ca1 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, co1 c
        ), cassign AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM ca1) t WHERE rn = 1
        ), qn AS (
          SELECT vec_id AS query_id, embedding AS qv,
                 sqrt(${duckDot("embedding", "embedding")}) AS qn
          FROM embeddings WHERE vec_id < 10
        ), qaff AS (
          SELECT q.query_id, c.cid,
                 round(${duckDot("q.qv", "c.cv")} /
                       (q.qn * sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM qn q, co1 c
        ), qcells AS (
          SELECT query_id, cid AS cell FROM (
            SELECT query_id, cid, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM qaff) t WHERE rn <= 4
        ), cand AS (
          SELECT qc.query_id, a.nid AS neighbor_id
          FROM qcells qc JOIN cassign a ON a.cell = qc.cell
        ),
        contrib AS (${(0 until 4).map(s => s"SELECT * FROM contrib_$s")
          .mkString(" UNION ALL ")}),
        scored AS (
          SELECT c.query_id, c.neighbor_id,
                 round(CAST(SUM(c.d) AS DOUBLE) /
                       (q.qn * sqrt(CAST(SUM(c.cc) AS DOUBLE))), 6) AS approx_cosine
          FROM contrib c
          JOIN cand ca ON ca.query_id = c.query_id
                      AND ca.neighbor_id = c.neighbor_id
          JOIN qn q ON q.query_id = c.query_id
          WHERE c.neighbor_id <> c.query_id
          GROUP BY c.query_id, c.neighbor_id, q.qn
        ), ranked AS (
          SELECT query_id, neighbor_id, approx_cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY approx_cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, approx_cosine
        FROM ranked WHERE rank <= 3"""
      }),

    // IVFADC + REFINE (VERDICT r12 #6): the probed-ADC shortlist of
    // k * 4, exact-reranked — the same escape hatch ann_pq_refined_topk
    // gives exhaustive ADC, applied to the sub-linear probed tier (whose
    // measured ceiling IS exhaustive ADC, QuantRecall). The oracle
    // replays the ivfpq chain to a depth-12 shortlist, then the exact
    // rerank.
    QueryDef(
      "ann_ivfadc_refined_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqTopKRefinedIndexed(s, IndexCache.pqIndex(s, dir),
          emb, emb.filter($"vec_id" < 10), "vec_id", "embedding",
          k = 3, dim = 64, m = 4, nProbe = 4, shortlistFactor = 4)
      },
      Some {
        s"""
        WITH ${pqOracleSubCtes()},
        co0 AS (
          SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cv
          FROM embeddings ORDER BY vec_id LIMIT 16
        ), ca0 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, co0 c
        ), cs0 AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM ca0) t WHERE rn = 1
        ), co1 AS (
          SELECT cell AS cid, list(v ORDER BY i) AS cv FROM (
            SELECT a.cell, i, round(AVG(e.embedding[i]::DOUBLE), 6) AS v
            FROM cs0 a JOIN embeddings e ON e.vec_id = a.nid,
                 range(1, 65) t(i)
            GROUP BY a.cell, i) s
          GROUP BY cell
        ), ca1 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, co1 c
        ), cassign AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM ca1) t WHERE rn = 1
        ), qn AS (
          SELECT vec_id AS query_id, embedding AS qv,
                 sqrt(${duckDot("embedding", "embedding")}) AS qn
          FROM embeddings WHERE vec_id < 10
        ), qaff AS (
          SELECT q.query_id, c.cid,
                 round(${duckDot("q.qv", "c.cv")} /
                       (q.qn * sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM qn q, co1 c
        ), qcells AS (
          SELECT query_id, cid AS cell FROM (
            SELECT query_id, cid, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM qaff) t WHERE rn <= 4
        ), cand AS (
          SELECT qc.query_id, a.nid AS neighbor_id
          FROM qcells qc JOIN cassign a ON a.cell = qc.cell
        ),
        contrib AS (${(0 until 4).map(s => s"SELECT * FROM contrib_$s")
          .mkString(" UNION ALL ")}),
        scored AS (
          SELECT c.query_id, c.neighbor_id,
                 round(CAST(SUM(c.d) AS DOUBLE) /
                       (q.qn * sqrt(CAST(SUM(c.cc) AS DOUBLE))), 6) AS approx_cosine
          FROM contrib c
          JOIN cand ca ON ca.query_id = c.query_id
                      AND ca.neighbor_id = c.neighbor_id
          JOIN qn q ON q.query_id = c.query_id
          WHERE c.neighbor_id <> c.query_id
          GROUP BY c.query_id, c.neighbor_id, q.qn
        ), shortlist AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY approx_cosine DESC, neighbor_id ASC) AS rank
            FROM scored) t WHERE rank <= 12
        ), exact AS (
          SELECT s.query_id, s.neighbor_id,
                 round(${duckDot("q.embedding", "c.embedding")} /
                       (sqrt(${duckDot("q.embedding", "q.embedding")}) *
                        sqrt(${duckDot("c.embedding", "c.embedding")})), 6) AS cosine
          FROM shortlist s
          JOIN embeddings c ON c.vec_id = s.neighbor_id
          JOIN embeddings q ON q.vec_id = s.query_id
        ), rr AS (
          SELECT query_id, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM exact
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        FROM rr WHERE rank <= 3"""
      }),

    // Incremental index growth — the 100 TB steady state: quantizers
    // train ONCE (here: over the even vec_ids), later batches encode
    // against the FROZEN codebooks/centroids and append codes in one
    // commit (never re-reading indexed vectors, never re-running
    // k-means — plan-asserted in AnnIndexSpec). The search then serves
    // the union. The oracle replays the same split: training CTEs
    // restricted to the first batch, encoding over everything.
    QueryDef(
      "ann_incremental_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        // the even-trained base index is warmed once (a production corpus
        // amortizes its build); the timed region is the INCREMENTAL work:
        // zero-copy clone + frozen-quantizer encode of the new batch +
        // the probe over the union
        val p = IndexCache.cloneIndex(s, IndexCache.pqIndexEven(s, dir),
          Seq("codebooks", "centroids", "codes"))
        Similarity.encodeIntoPqIndex(s, p, emb.filter($"vec_id" % 2 =!= 0),
          "vec_id", "embedding", dim = 64, m = 4)
        Similarity.ivfPqTopKIndexed(s, p, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 3, dim = 64, m = 4, nProbe = 4)
      },
      Some {
        s"""
        WITH ${pqOracleSubCtes(trainCond = "vec_id % 2 = 0")},
        co0 AS (
          SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cv
          FROM embeddings WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 16
        ), ca0 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, co0 c WHERE e.vec_id % 2 = 0
        ), cs0 AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM ca0) t WHERE rn = 1
        ), co1 AS (
          SELECT cell AS cid, list(v ORDER BY i) AS cv FROM (
            SELECT a.cell, i, round(AVG(e.embedding[i]::DOUBLE), 6) AS v
            FROM cs0 a JOIN embeddings e ON e.vec_id = a.nid,
                 range(1, 65) t(i)
            GROUP BY a.cell, i) s
          GROUP BY cell
        ), ca1 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, co1 c
        ), cassign AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM ca1) t WHERE rn = 1
        ), qn AS (
          SELECT vec_id AS query_id, embedding AS qv,
                 sqrt(${duckDot("embedding", "embedding")}) AS qn
          FROM embeddings WHERE vec_id < 10
        ), qaff AS (
          SELECT q.query_id, c.cid,
                 round(${duckDot("q.qv", "c.cv")} /
                       (q.qn * sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM qn q, co1 c
        ), qcells AS (
          SELECT query_id, cid AS cell FROM (
            SELECT query_id, cid, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM qaff) t WHERE rn <= 4
        ), cand AS (
          SELECT qc.query_id, a.nid AS neighbor_id
          FROM qcells qc JOIN cassign a ON a.cell = qc.cell
        ),
        contrib AS (${(0 until 4).map(s => s"SELECT * FROM contrib_$s")
          .mkString(" UNION ALL ")}),
        scored AS (
          SELECT c.query_id, c.neighbor_id,
                 round(CAST(SUM(c.d) AS DOUBLE) /
                       (q.qn * sqrt(CAST(SUM(c.cc) AS DOUBLE))), 6) AS approx_cosine
          FROM contrib c
          JOIN cand ca ON ca.query_id = c.query_id
                      AND ca.neighbor_id = c.neighbor_id
          JOIN qn q ON q.query_id = c.query_id
          WHERE c.neighbor_id <> c.query_id
          GROUP BY c.query_id, c.neighbor_id, q.qn
        ), ranked AS (
          SELECT query_id, neighbor_id, approx_cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY approx_cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, approx_cosine
        FROM ranked WHERE rank <= 3"""
      }),

    // The ANN index-build numbers, timed and oracled on their own (fresh
    // build each call; probes above use the warmed IndexCache copy). The
    // summaries read the STORED tables back — the artifact round-trips.
    QueryDef(
      "ann_pq_index_build",
      (s, dir) => {
        import s.implicits._
        val p = Tables.tmpDir("pqb")
        Similarity.writePqIndex(s, p, t(s, dir, "embeddings"),
          "vec_id", "embedding", dim = 64, m = 4, ksub = 8, trainIters = 1,
          coarseCells = 16, coarseIters = 1)
        graft.delta.DeltaTable.forPath(s, s"$p/codes").toDF
          .select(posexplode(array((0 until 4).map(i => col(s"code_$i")): _*)))
          .groupBy($"pos".as("s"))
          .agg(count(lit(1)).as("n_docs"), countDistinct($"col").as("n_codes"))
      },
      Some {
        s"""
        WITH ${pqOracleSubCtes()}
        ${(0 until 4).map(s =>
          s"SELECT CAST($s AS INT) AS s, COUNT(*) AS n_docs, " +
            s"COUNT(DISTINCT code) AS n_codes FROM code_$s")
          .mkString(" UNION ALL ")}"""
      }),

    QueryDef(
      "ann_ivf_index_build",
      (s, dir) => {
        import s.implicits._
        val p = Tables.tmpDir("ivfb")
        Similarity.writeIvfIndex(s, p, t(s, dir, "embeddings"),
          "vec_id", "embedding", nCells = 16, trainIters = 0)
        graft.delta.DeltaTable.forPath(s, s"$p/members").toDF
          .groupBy($"cell")
          .agg(count(lit(1)).as("n_members"))
      },
      Some(s"""
        WITH cents AS (
          SELECT vec_id AS cid, embedding AS cv
          FROM embeddings ORDER BY vec_id LIMIT 16
        ), aff AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, cents c
        ), assign AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM aff) t WHERE rn = 1
        )
        SELECT cell, COUNT(*) AS n_members FROM assign GROUP BY cell""")),

    // SQ8 scalar quantization — the int8 compression tier between raw
    // IVF members and PQ codes (FAISS IndexScalarQuantizer shape):
    // training is one per-dimension min/max aggregation, codes are 8x
    // smaller than float32 vectors, and search is a compressed linear
    // scan reconstructing each dimension from its 0..255 level.
    QueryDef(
      "ann_sq8_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        // probes the PERSISTED SQ8 index: ranking reads the int-code
        // table + the broadcast 1-row range params; raw corpus vectors
        // are never scanned and nothing trains at query time
        Similarity.sq8TopKIndexed(s, IndexCache.sq8Index(s, dir),
          emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 3)
      },
      Some(s"""
        WITH params AS (
          SELECT i, MIN(e.embedding[i]::DOUBLE) AS lo,
                 MAX(e.embedding[i]::DOUBLE) AS hi
          FROM embeddings e, range(1, 65) t(i) GROUP BY i
        ), codes AS (
          SELECT e.vec_id, p.i,
                 CASE WHEN p.hi = p.lo THEN 0
                      ELSE CAST(round((e.embedding[p.i]::DOUBLE - p.lo) * 255.0
                                      / (p.hi - p.lo), 0) AS INT) END AS code
          FROM embeddings e CROSS JOIN params p
        ), vhat AS (
          SELECT c.vec_id, c.i,
                 p.lo + c.code * (p.hi - p.lo) / 255.0 AS vh
          FROM codes c JOIN params p ON p.i = c.i
        ), q AS (
          SELECT vec_id AS query_id, embedding AS qv,
                 sqrt(${duckDot("embedding", "embedding")}) AS qn
          FROM embeddings WHERE vec_id < 10
        ), qterm AS (
          SELECT q.query_id, q.qn, t.i, q.qv[t.i]::DOUBLE AS qe
          FROM q, range(1, 65) t(i)
        ), contrib AS (
          SELECT qt.query_id, v.vec_id AS neighbor_id, qt.qn,
                 CAST(round(qt.qe * v.vh, 6) AS DECIMAL(18,6)) AS d,
                 CAST(round(v.vh * v.vh, 6) AS DECIMAL(18,6)) AS cc
          FROM vhat v JOIN qterm qt ON qt.i = v.i
          WHERE v.vec_id <> qt.query_id
        ), scored AS (
          SELECT query_id, neighbor_id,
                 round(CAST(SUM(d) AS DOUBLE) /
                       (qn * sqrt(CAST(SUM(cc) AS DOUBLE))), 6) AS approx_cosine
          FROM contrib GROUP BY query_id, neighbor_id, qn
        ), ranked AS (
          SELECT query_id, neighbor_id, approx_cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY approx_cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, approx_cosine
        FROM ranked WHERE rank <= 3""")),

    // SQ8 incremental growth: ranges train on the even half, the odd
    // half encodes against the FROZEN params and appends; search serves
    // the union. The oracle trains its params CTE on the evens only.
    QueryDef(
      "ann_incremental_sq8",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val p = Tables.tmpDir("sq8inc")
        Similarity.writeSq8Index(s, p, emb.filter($"vec_id" % 2 === 0),
          "vec_id", "embedding")
        Similarity.encodeIntoSq8Index(s, p, emb.filter($"vec_id" % 2 =!= 0),
          "vec_id", "embedding")
        Similarity.sq8TopKIndexed(s, p, emb.filter($"vec_id" < 10),
          "vec_id", "embedding", k = 3)
      },
      Some(s"""
        WITH params AS (
          SELECT i, MIN(e.embedding[i]::DOUBLE) AS lo,
                 MAX(e.embedding[i]::DOUBLE) AS hi
          FROM embeddings e, range(1, 65) t(i)
          WHERE e.vec_id % 2 = 0 GROUP BY i
        ), codes AS (
          SELECT e.vec_id, p.i,
                 CASE WHEN p.hi = p.lo THEN 0
                      ELSE CAST(round((e.embedding[p.i]::DOUBLE - p.lo) * 255.0
                                      / (p.hi - p.lo), 0) AS INT) END AS code
          FROM embeddings e CROSS JOIN params p
        ), vhat AS (
          SELECT c.vec_id, c.i,
                 p.lo + c.code * (p.hi - p.lo) / 255.0 AS vh
          FROM codes c JOIN params p ON p.i = c.i
        ), q AS (
          SELECT vec_id AS query_id, embedding AS qv,
                 sqrt(${duckDot("embedding", "embedding")}) AS qn
          FROM embeddings WHERE vec_id < 10
        ), qterm AS (
          SELECT q.query_id, q.qn, t.i, q.qv[t.i]::DOUBLE AS qe
          FROM q, range(1, 65) t(i)
        ), contrib AS (
          SELECT qt.query_id, v.vec_id AS neighbor_id, qt.qn,
                 CAST(round(qt.qe * v.vh, 6) AS DECIMAL(18,6)) AS d,
                 CAST(round(v.vh * v.vh, 6) AS DECIMAL(18,6)) AS cc
          FROM vhat v JOIN qterm qt ON qt.i = v.i
          WHERE v.vec_id <> qt.query_id
        ), scored AS (
          SELECT query_id, neighbor_id,
                 round(CAST(SUM(d) AS DOUBLE) /
                       (qn * sqrt(CAST(SUM(cc) AS DOUBLE))), 6) AS approx_cosine
          FROM contrib GROUP BY query_id, neighbor_id, qn
        ), ranked AS (
          SELECT query_id, neighbor_id, approx_cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY approx_cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, approx_cosine
        FROM ranked WHERE rank <= 3""")),

    QueryDef(
      "ann_sq8_index_build",
      (s, dir) => {
        import s.implicits._
        val p = Tables.tmpDir("sq8b")
        Similarity.writeSq8Index(s, p, t(s, dir, "embeddings"),
          "vec_id", "embedding")
        graft.delta.DeltaTable.forPath(s, s"$p/codes").toDF
          .select(col("id"), posexplode(col("codes")).as(Seq("i0", "code")))
          .groupBy(($"i0" + 1).cast("bigint").as("i"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"code").as("n_codes"),
            sum($"code").cast("bigint").as("code_sum"))
      },
      Some(s"""
        WITH params AS (
          SELECT i, MIN(e.embedding[i]::DOUBLE) AS lo,
                 MAX(e.embedding[i]::DOUBLE) AS hi
          FROM embeddings e, range(1, 65) t(i) GROUP BY i
        ), codes AS (
          SELECT e.vec_id, p.i,
                 CASE WHEN p.hi = p.lo THEN 0
                      ELSE CAST(round((e.embedding[p.i]::DOUBLE - p.lo) * 255.0
                                      / (p.hi - p.lo), 0) AS INT) END AS code
          FROM embeddings e CROSS JOIN params p
        )
        SELECT i, COUNT(*) AS n_docs, COUNT(DISTINCT code) AS n_codes,
               CAST(SUM(code) AS BIGINT) AS code_sum
        FROM codes GROUP BY i""")),

    QueryDef(
      "ann_ivf_kmeans_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        // same persisted-index path, 2-iteration k-means quantizer
        Similarity.ivfTopKIndexed(s, IndexCache.ivfIndex(s, dir, 2),
          emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 3,
          nProbe = 4)
      },
      Some(s"""
        WITH cents0 AS (
          SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS cv
          FROM embeddings ORDER BY vec_id LIMIT 16
        ), aff0 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, cents0 c
        ), assign0 AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM aff0) t WHERE rn = 1
        ), cents1 AS (
          SELECT cell AS cid, list(v ORDER BY i) AS cv FROM (
            SELECT a.cell, i, round(AVG(e.embedding[i]::DOUBLE), 6) AS v
            FROM assign0 a JOIN embeddings e ON e.vec_id = a.nid,
                 range(1, 65) t(i)
            GROUP BY a.cell, i) s
          GROUP BY cell
        ), aff1 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, cents1 c
        ), assign1 AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM aff1) t WHERE rn = 1
        ), cents2 AS (
          SELECT cell AS cid, list(v ORDER BY i) AS cv FROM (
            SELECT a.cell, i, round(AVG(e.embedding[i]::DOUBLE), 6) AS v
            FROM assign1 a JOIN embeddings e ON e.vec_id = a.nid,
                 range(1, 65) t(i)
            GROUP BY a.cell, i) s
          GROUP BY cell
        ), aff2 AS (
          SELECT e.vec_id AS nid, c.cid,
                 round(${duckDot("e.embedding", "c.cv")} /
                       (sqrt(${duckDot("e.embedding", "e.embedding")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM embeddings e, cents2 c
        ), assign AS (
          SELECT nid, cid AS cell FROM (
            SELECT nid, cid, ROW_NUMBER() OVER (PARTITION BY nid
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM aff2) t WHERE rn = 1
        ), q AS (
          SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 10
        ), qaff AS (
          SELECT q.query_id, q.qv, c.cid,
                 round(${duckDot("q.qv", "c.cv")} /
                       (sqrt(${duckDot("q.qv", "q.qv")}) *
                        sqrt(${duckDot("c.cv", "c.cv")})), 6) AS aff
          FROM q, cents2 c
        ), qcells AS (
          SELECT query_id, qv, cid AS cell FROM (
            SELECT query_id, qv, cid, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY aff DESC, cid ASC) AS rn
            FROM qaff) t WHERE rn <= 4
        ), scored AS (
          SELECT qc.query_id, e.vec_id AS neighbor_id,
                 round(${duckDot("qc.qv", "e.embedding")} /
                       (sqrt(${duckDot("qc.qv", "qc.qv")}) *
                        sqrt(${duckDot("e.embedding", "e.embedding")})), 6) AS cosine
          FROM qcells qc
          JOIN assign a ON a.cell = qc.cell
          JOIN embeddings e ON e.vec_id = a.nid
          WHERE e.vec_id <> qc.query_id
        ), ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        FROM ranked WHERE rank <= 3""")),

    // ---------------------------------------------------------- multimodal
    QueryDef(
      "multimodal_transform",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val media = Multimodal.mediaFromText(docs, "doc_id", "text")
        val resized = Multimodal.resize(media, 64, 64) // byte budget 16
        val frames = Multimodal.sampleFrames(media, frameBytes = 32, everyN = 2)
        val frameCounts = frames.groupBy($"id")
          .agg(count(lit(1)).as("n_frames"))
        resized
          .join(frameCounts, Seq("id"), "left")
          .join(docs.select($"doc_id".as("id"), $"lang"), Seq("id"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n"),
               sum($"n_bytes").as("resized_bytes"),
               sum(coalesce($"n_frames", lit(0L))).as("sampled_frames"))
      },
      Some("""
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(LEAST(strlen(text), 16)) AS BIGINT) AS resized_bytes,
               CAST(SUM(CAST(ceil((strlen(text) // 32) / 2.0) AS BIGINT)) AS BIGINT) AS sampled_frames
        FROM documents GROUP BY lang""")),

    QueryDef(
      "multimodal_features",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val media = Multimodal.mediaFromText(docs, "doc_id", "text")
        val features = Multimodal.extractFeatures(media)
        media
          .withColumn("byte_sum", Multimodal.byteSum($"media"))
          .join(features, Seq("id"))
          .join(docs.select($"doc_id".as("id"), $"lang"), Seq("id"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n"),
               sum($"n_bytes").as("total_bytes"),
               sum($"byte_sum").as("total_byte_sum"),
               sum(size($"features").cast("long")).as("total_features"))
      },
      Some("""
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
               CAST(SUM(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
                 (a, b) -> a + b)) AS BIGINT) AS total_byte_sum,
               CAST(SUM(LEAST(16, length(text))) AS BIGINT) AS total_features
        FROM documents GROUP BY lang""")),

    // REAL WAV decode over distributed binary blobs: spec-compliant
    // RIFF/PCM containers are synthesized per partition from doc ids
    // (the container ships no media), then parsed by the real chunk
    // walker (MediaCodecs.decodeWav) — the oracle replays the decoded
    // moments from the synthesis tone's closed form with pure SQL
    // arithmetic, so a hash match proves actual binary parsing (chunk
    // ids, LE sizes, int16 folds), not fabricated features.
    QueryDef(
      "multimodal_wav_decode",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val media = Multimodal.wavMedia(docs.select($"doc_id"), "doc_id")
        Multimodal.wavFeatures(media)
          .join(docs.select($"doc_id".as("id"), $"lang"), Seq("id"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n"),
               sum($"n_samples").as("total_samples"),
               sum($"mean_amp".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_amp"),
               sum($"peak_amp".cast("long")).as("sum_peak"))
      },
      Some("""
        WITH d AS (SELECT doc_id, lang, 64 + doc_id % 64 AS ns FROM documents),
        nums AS (SELECT i FROM generate_series(0, 127) AS g(i)),
        samples AS (
          SELECT d.doc_id, d.lang, d.ns,
                 ((d.doc_id * 31 + nums.i * 7) % 251 - 125) * 200 AS v
          FROM d JOIN nums ON nums.i < d.ns),
        per AS (
          SELECT doc_id, lang, ns,
                 CAST(SUM(v) AS DOUBLE) / ns AS mean_amp,
                 MAX(ABS(v)) AS peak
          FROM samples GROUP BY doc_id, lang, ns)
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(ns) AS BIGINT) AS total_samples,
               CAST(SUM(CAST(mean_amp AS DECIMAL(18,6))) AS DOUBLE)
                 AS sum_mean_amp,
               CAST(SUM(peak) AS BIGINT) AS sum_peak
        FROM per GROUP BY lang""")),

    // REAL BMP decode: 24-bit BI_RGB bitmaps (bottom-up padded rows)
    // synthesized per partition, parsed by MediaCodecs.decodeBmp; the
    // mod-5 widths sweep every 4-byte row-padding remainder, so the
    // oracle match fails if padding handling is off by even one byte.
    QueryDef(
      "multimodal_bmp_decode",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val media = Multimodal.bmpMedia(docs.select($"doc_id"), "doc_id")
        Multimodal.bmpFeatures(media)
          .join(docs.select($"doc_id".as("id"), $"lang"), Seq("id"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n"),
               sum($"width".cast("long") * $"height".cast("long"))
                 .as("total_px"),
               sum($"mean_r".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_r"),
               sum($"mean_g".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_g"),
               sum($"mean_b".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_b"))
      },
      Some("""
        WITH d AS (SELECT doc_id, lang, 4 + doc_id % 5 AS w,
                          3 + doc_id % 4 AS h FROM documents),
        xs AS (SELECT i FROM generate_series(0, 7) AS g(i)),
        ys AS (SELECT j FROM generate_series(0, 5) AS g(j)),
        px AS (
          SELECT d.doc_id, d.lang, d.w, d.h,
                 (d.doc_id + 3 * xs.i + 7 * ys.j) % 256 AS r,
                 (d.doc_id + 5 * xs.i + 11 * ys.j) % 256 AS g,
                 (d.doc_id + 2 * xs.i + 13 * ys.j) % 256 AS b
          FROM d JOIN xs ON xs.i < d.w JOIN ys ON ys.j < d.h),
        per AS (
          SELECT doc_id, lang, w, h,
                 CAST(SUM(r) AS DOUBLE) / (w * h) AS mr,
                 CAST(SUM(g) AS DOUBLE) / (w * h) AS mg,
                 CAST(SUM(b) AS DOUBLE) / (w * h) AS mb
          FROM px GROUP BY doc_id, lang, w, h)
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(w * h) AS BIGINT) AS total_px,
               CAST(SUM(CAST(mr AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_r,
               CAST(SUM(CAST(mg AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_g,
               CAST(SUM(CAST(mb AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_b
        FROM per GROUP BY lang""")),

    // PNG: the compressed-container tier of the image path — chunk CRCs,
    // a real zlib inflate, and the five-filter scanline reconstruction
    // (the BMP decoder above exercises none of those). Same closed-form
    // pixels as BMP, so the oracle replays the means arithmetically.
    QueryDef(
      "multimodal_png_decode",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val media = Multimodal.pngMedia(docs.select($"doc_id"), "doc_id")
        Multimodal.pngFeatures(media)
          .join(docs.select($"doc_id".as("id"), $"lang"), Seq("id"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n"),
               sum($"width".cast("long") * $"height".cast("long"))
                 .as("total_px"),
               sum($"mean_r".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_r"),
               sum($"mean_g".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_g"),
               sum($"mean_b".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_b"))
      },
      Some("""
        WITH d AS (SELECT doc_id, lang, 3 + doc_id % 6 AS w,
                          5 + doc_id % 5 AS h FROM documents),
        xs AS (SELECT i FROM generate_series(0, 8) AS g(i)),
        ys AS (SELECT j FROM generate_series(0, 9) AS g(j)),
        px AS (
          SELECT d.doc_id, d.lang, d.w, d.h,
                 (d.doc_id + 3 * xs.i + 7 * ys.j) % 256 AS r,
                 (d.doc_id + 5 * xs.i + 11 * ys.j) % 256 AS g,
                 (d.doc_id + 2 * xs.i + 13 * ys.j) % 256 AS b
          FROM d JOIN xs ON xs.i < d.w JOIN ys ON ys.j < d.h),
        per AS (
          SELECT doc_id, lang, w, h,
                 CAST(SUM(r) AS DOUBLE) / (w * h) AS mr,
                 CAST(SUM(g) AS DOUBLE) / (w * h) AS mg,
                 CAST(SUM(b) AS DOUBLE) / (w * h) AS mb
          FROM px GROUP BY doc_id, lang, w, h)
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(w * h) AS BIGINT) AS total_px,
               CAST(SUM(CAST(mr AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_r,
               CAST(SUM(CAST(mg AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_g,
               CAST(SUM(CAST(mb AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_b
        FROM per GROUP BY lang""")),

    // G.711 mu-law audio ([[MediaCodecs.muLawDecode]] behind the same
    // WAV face, format tag 7): the blob bytes are a closed form, so the
    // oracle replays the COMPANDING EXPANSION itself in SQL (complement,
    // exponent/mantissa split, shift) — a hash match proves the decode
    // formula bit-for-bit, not just the container walk.
    QueryDef(
      "multimodal_ulaw_decode",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val media = Multimodal.ulawMedia(docs.select($"doc_id"), "doc_id")
        Multimodal.wavFeatures(media)
          .join(docs.select($"doc_id".as("id"), $"lang"), Seq("id"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n"),
               sum($"n_samples").as("total_samples"),
               sum($"mean_amp".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_amp"),
               sum($"peak_amp".cast("long")).as("sum_peak"))
      },
      Some("""
        WITH d AS (SELECT doc_id, lang,
                          50 + 2 * (doc_id % 10) AS ns FROM documents),
        nums AS (SELECT k FROM generate_series(0, 67) AS g(k)),
        bytes AS (
          SELECT d.doc_id, d.lang, d.ns,
                 255 - ((d.doc_id * 13 + nums.k * 7) % 256) AS u
          FROM d JOIN nums ON nums.k < d.ns),
        dec AS (
          SELECT doc_id, lang, ns,
                 (CASE WHEN u >= 128 THEN -1 ELSE 1 END) *
                 (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) - 132)
                   AS smp
          FROM bytes),
        per AS (
          SELECT doc_id, lang, ns,
                 CAST(SUM(smp) AS DOUBLE) / ns AS mean_amp,
                 MAX(ABS(smp)) AS peak
          FROM dec GROUP BY doc_id, lang, ns)
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(ns) AS BIGINT) AS total_samples,
               CAST(SUM(CAST(mean_amp AS DECIMAL(18,6))) AS DOUBLE)
                 AS sum_mean_amp,
               CAST(SUM(peak) AS BIGINT) AS sum_peak
        FROM per GROUP BY lang""")),

    // GIF decode ([[MediaCodecs.decodeGif]]): block walking, color
    // tables and a FULL variable-width LZW decode — the one codec here
    // with a real compression dictionary. Palette AND index closed
    // forms replay in SQL, so the hash match proves the palette lookup
    // composed with the LZW expansion byte-for-byte.
    QueryDef(
      "multimodal_gif_decode",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val media = Multimodal.gifMedia(docs.select($"doc_id"), "doc_id")
        Multimodal.gifFeatures(media)
          .join(docs.select($"doc_id".as("id"), $"lang"), Seq("id"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n"),
               sum($"width".cast("long") * $"height".cast("long"))
                 .as("total_px"),
               sum($"mean_r".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_r"),
               sum($"mean_g".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_g"),
               sum($"mean_b".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_b"))
      },
      Some("""
        WITH d AS (SELECT doc_id, lang, 3 + doc_id % 4 AS w,
                          2 + doc_id % 3 AS h FROM documents),
        xs AS (SELECT i FROM generate_series(0, 5) AS g(i)),
        ys AS (SELECT j FROM generate_series(0, 3) AS g(j)),
        px AS (
          SELECT d.doc_id, d.lang, d.w, d.h,
                 (d.doc_id + 3 * xs.i + 7 * ys.j) % 256 AS idx
          FROM d JOIN xs ON xs.i < d.w JOIN ys ON ys.j < d.h),
        pc AS (
          SELECT doc_id, lang, w, h,
                 (doc_id + 5 * idx) % 256 AS r,
                 (doc_id * 3 + 11 * idx) % 256 AS g,
                 (doc_id * 7 + 13 * idx) % 256 AS b
          FROM px),
        per AS (
          SELECT doc_id, lang, w, h,
                 CAST(SUM(r) AS DOUBLE) / (w * h) AS mr,
                 CAST(SUM(g) AS DOUBLE) / (w * h) AS mg,
                 CAST(SUM(b) AS DOUBLE) / (w * h) AS mb
          FROM pc GROUP BY doc_id, lang, w, h)
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(w * h) AS BIGINT) AS total_px,
               CAST(SUM(CAST(mr AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_r,
               CAST(SUM(CAST(mg AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_g,
               CAST(SUM(CAST(mb AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_b
        FROM per GROUP BY lang""")),

    // Baseline-JPEG decode over synthesized-but-real JPEG blobs (the
    // format a 100 TB multimodal corpus is mostly made of): full marker
    // walk, Annex-K Huffman decode, dequant + IDCT, fixed-point
    // YCbCr->RGB in executor tasks. Blocks are constant per 8x8 by
    // construction, so the decode is bit-exact and the oracle mirrors
    // the libjpeg fixed-point color math with FLOOR(x/65536).
    QueryDef(
      "multimodal_jpeg_decode",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val media = Multimodal.jpegMedia(docs.select($"doc_id"), "doc_id")
        Multimodal.jpegFeatures(media)
          .join(docs.select($"doc_id".as("id"), $"lang"), Seq("id"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n"),
               sum($"width".cast("long") * $"height".cast("long"))
                 .as("total_px"),
               sum($"mean_r".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_r"),
               sum($"mean_g".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_g"),
               sum($"mean_b".cast(DecimalType(18, 6))).cast("double")
                 .as("sum_mean_b"))
      },
      Some("""
        WITH d AS (SELECT doc_id, lang, 1 + doc_id % 3 AS bw,
                          1 + doc_id % 2 AS bh FROM documents),
        xs AS (SELECT i FROM generate_series(0, 2) AS g(i)),
        ys AS (SELECT j FROM generate_series(0, 1) AS g(j)),
        blk AS (
          SELECT d.doc_id, d.lang, d.bw, d.bh,
                 (d.doc_id + 3 * xs.i + 7 * ys.j) % 256 AS y,
                 (d.doc_id * 3 + 5 * xs.i + 11 * ys.j) % 256 AS cb,
                 (d.doc_id * 7 + 13 * xs.i + 17 * ys.j) % 256 AS cr
          FROM d JOIN xs ON xs.i < d.bw JOIN ys ON ys.j < d.bh),
        rgb AS (
          SELECT doc_id, lang, bw, bh,
                 LEAST(255, GREATEST(0, y + CAST(FLOOR(
                   (91881 * (cr - 128) + 32768) / 65536.0) AS BIGINT))) AS r,
                 LEAST(255, GREATEST(0, y - CAST(FLOOR(
                   (22554 * (cb - 128) + 46802 * (cr - 128) + 32768)
                   / 65536.0) AS BIGINT))) AS g,
                 LEAST(255, GREATEST(0, y + CAST(FLOOR(
                   (116130 * (cb - 128) + 32768) / 65536.0) AS BIGINT))) AS b
          FROM blk),
        per AS (
          SELECT doc_id, lang, bw, bh,
                 CAST(SUM(r) AS DOUBLE) / (bw * bh) AS mr,
                 CAST(SUM(g) AS DOUBLE) / (bw * bh) AS mg,
                 CAST(SUM(b) AS DOUBLE) / (bw * bh) AS mb
          FROM rgb GROUP BY doc_id, lang, bw, bh)
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(bw * 8 * bh * 8) AS BIGINT) AS total_px,
               CAST(SUM(CAST(mr AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_r,
               CAST(SUM(CAST(mg AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_g,
               CAST(SUM(CAST(mb AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_b
        FROM per GROUP BY lang""")),

    // Content-addressable media dedup: hash the BINARY payload itself
    // (the standard blob-store dedup for image/audio corpora — identical
    // bytes collapse regardless of metadata). One hash pass + one
    // map-side-combinable group; no payload shuffle beyond the 32-char
    // digest.
    QueryDef(
      "multimodal_dedup",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        // a re-ingested slice under new ids — the blob-store scenario:
        // identical bytes arriving twice must collapse by content hash
        val reingested = docs.filter($"doc_id" % 50 === 0)
          .withColumn("doc_id", $"doc_id" + 1000000L)
        val media = Multimodal.mediaFromText(
          docs.unionByName(reingested), "doc_id", "text")
        media.select($"id", md5($"media").as("h"))
          .groupBy($"h")
          .agg(count(lit(1)).as("n_copies"), min($"id").as("keeper_id"))
          .filter($"n_copies" > 1)
      },
      Some("""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0)
        SELECT md5(text) AS h, COUNT(*) AS n_copies,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_id
        FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1""")),

    // ------------------------------------------------------------ curation
    QueryDef(
      "curate_hash_split",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        Curation.hashSplit(docs, "doc_id",
            Seq("train" -> 90, "val" -> 5, "test" -> 5))
          .select($"split", $"lang", tokenCount($"text").as("toks"))
          .groupBy($"split", $"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"toks".cast("long")).as("sum_tokens"))
      },
      Some(raw"""
        WITH b AS (
          SELECT lang, text,
                 ${duckHash32("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
          FROM documents)
        SELECT CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
               lang, COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS sum_tokens
        FROM b GROUP BY 1, 2""")),

    // Leakage-safe split ([[Curation.groupSplit]]): exact-duplicate
    // clusters (prefix-40 key, the dedup_exact convention) must land
    // whole in one split — the oracle replays the cluster label as a
    // window MIN over the duplicate key and the same md5 bucket
    // decision, so a hash match proves no twin straddles the cut.
    QueryDef(
      "curate_group_split",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val keyed = docs.select($"doc_id", substring($"text", 1, 40).as("k"))
        val reps = keyed.groupBy($"k")
          .agg(min($"doc_id").as("i"), count(lit(1)).as("n"))
          .filter($"n" > 1)
        val pairs = keyed.join(reps, Seq("k")).filter($"doc_id" =!= $"i")
          .select($"i", $"doc_id".as("j"))
        Curation.groupSplit(docs, "doc_id", pairs,
            Seq("train" -> 90, "val" -> 5, "test" -> 5))
          .groupBy($"split", $"lang").agg(count(lit(1)).as("n_docs"))
      },
      Some(raw"""
        WITH c AS (
          SELECT doc_id, lang,
                 MIN(doc_id) OVER (PARTITION BY substr(text, 1, 40)) AS cluster
          FROM documents),
        b AS (
          SELECT lang,
                 ${duckHash32("CAST(cluster AS VARCHAR)")} % 100 AS bucket
          FROM c)
        SELECT CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
               lang, COUNT(*) AS n_docs
        FROM b GROUP BY 1, 2""")),

    QueryDef(
      "curate_hash_sample",
      (s, dir) => {
        import s.implicits._
        Curation.hashSample(t(s, dir, "documents"), "doc_id", 0.2, "s1")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"n_chars".cast("long")).as("sum_chars"))
      },
      Some(s"""
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE ${duckHash32("'s1' || ':' || CAST(doc_id AS VARCHAR)")} % 1000000 < 200000
        GROUP BY lang""")),

    QueryDef(
      "curate_pack_sequences",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        Curation.packSequences(docs, "doc_id", tokenCount($"text"),
            ctxLen = 512, buckets = 8)
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_docs"),
               sum($"toks").as("total_tokens"),
               (max($"last_chunk") + 1).as("n_chunks"),
               count(when($"first_chunk" =!= $"last_chunk", 1)).as("n_straddling"))
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id,
                 ${duckHash32("CAST(doc_id AS VARCHAR)")} % 8 AS bucket,
                 len(regexp_split_to_array(trim(text), '\s+')) AS toks
          FROM documents),
        off AS (
          SELECT bucket, toks,
                 COALESCE(SUM(toks) OVER (PARTITION BY bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
          FROM toks WHERE toks > 0)
        SELECT bucket, COUNT(*) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS total_tokens,
               CAST(MAX((o + toks - 1) // 512) + 1 AS BIGINT) AS n_chunks,
               COUNT(CASE WHEN o // 512 <> (o + toks - 1) // 512 THEN 1 END) AS n_straddling
        FROM off GROUP BY bucket""")),

    QueryDef(
      "curate_length_buckets",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        Curation.lengthBuckets(docs, tokenCount($"text"), bucketWidth = 16)
          .orderBy($"bucket")
      },
      Some(raw"""
        WITH toks AS (
          SELECT len(regexp_split_to_array(trim(text), '\s+')) AS toks
          FROM documents)
        SELECT toks // 16 AS bucket, COUNT(*) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS total_tokens,
               CAST(MAX(toks) AS BIGINT) AS max_toks,
               CAST(COUNT(*) * MAX(toks) - SUM(toks) AS BIGINT)
                 AS padding_waste
        FROM toks WHERE toks > 0 GROUP BY 1""")),

    QueryDef(
      "curate_chunk_overlap",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").select($"doc_id", $"lang", $"text")
        Curation.chunkWithOverlap(docs, "text", chunkTokens = 64, overlap = 16)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_chunks"),
               sum($"chunk_tokens".cast("long")).as("sum_chunk_tokens"),
               countDistinct($"doc_id").as("n_docs"),
               sum(graft.functions.md5Hash32($"chunk_text")).as("chunk_sig"))
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id, lang,
                 regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents),
        starts AS (
          SELECT doc_id, lang, t,
                 unnest(range(0, len(t), 48)) AS s
          FROM toks),
        chunks AS (
          SELECT doc_id, lang,
                 array_to_string(list_slice(t, s + 1, s + 64), ' ') AS chunk_text,
                 len(list_slice(t, s + 1, s + 64)) AS chunk_tokens
          FROM starts)
        SELECT lang, COUNT(*) AS n_chunks,
               CAST(SUM(chunk_tokens) AS BIGINT) AS sum_chunk_tokens,
               COUNT(DISTINCT doc_id) AS n_docs,
               CAST(SUM(${duckHash32("chunk_text")}) AS BIGINT) AS chunk_sig
        FROM chunks GROUP BY lang""")),

    QueryDef(
      "curate_scrub",
      (s, dir) => {
        import s.implicits._
        Curation.scrub(t(s, dir, "documents"), "text",
            raw"\bcustomer\b", "[REDACTED]", "clean")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               count(when($"clean_hits" > 0, 1)).as("docs_hit"),
               sum($"clean_hits".cast("long")).as("total_hits"),
               sum(length($"clean").cast("long")).as("clean_chars"))
      },
      Some(raw"""
        SELECT lang, COUNT(*) AS n_docs,
               COUNT(CASE WHEN len(regexp_extract_all(text, '\bcustomer\b')) > 0 THEN 1 END) AS docs_hit,
               CAST(SUM(len(regexp_extract_all(text, '\bcustomer\b'))) AS BIGINT) AS total_hits,
               CAST(SUM(length(regexp_replace(text, '\bcustomer\b', '[REDACTED]', 'g'))) AS BIGINT) AS clean_chars
        FROM documents GROUP BY lang""")),

    // Quality-weighted (importance) sampling: keep probability = the
    // doc's length-based quality weight; pure hash threshold, so the
    // sample is identical on re-run and across engines.
    QueryDef(
      "curate_importance_sample",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val weight = least($"n_chars".cast("double") / 400.0, lit(1.0))
        Curation.importanceSample(docs, "doc_id", weight, "q1")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_kept"),
               sum($"n_chars".cast("long")).as("sum_chars"),
               min($"doc_id").as("min_id"))
      },
      Some(s"""
        SELECT lang, COUNT(*) AS n_kept,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(MIN(doc_id) AS BIGINT) AS min_id
        FROM documents
        WHERE ${duckHash32("'q1' || ':' || CAST(doc_id AS VARCHAR)")} % 1000000
              < CAST(FLOOR(LEAST(n_chars::DOUBLE / 400.0, 1.0) * 1000000.0) AS BIGINT)
        GROUP BY lang""")),

    // PII surface statistics (emails / URLs / phone-shaped strings) per
    // language — the audit pass that runs BEFORE scrubbing decides what
    // to redact. Pure regexp counts, codegen'd, one aggregation.
    QueryDef(
      "text_pii_stats",
      (s, dir) => {
        import s.implicits._
        val email = raw"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
        val url = raw"https?://[^\s]+"
        val phone = raw"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
        def hits(p: String) =
          size(regexp_extract_all($"text", lit(p), lit(0)))
        t(s, dir, "documents")
          .select($"lang",
            hits(email).as("emails"),
            hits(url).as("urls"),
            hits(phone).as("phones"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"emails".cast("long")).as("n_emails"),
               sum($"urls".cast("long")).as("n_urls"),
               sum($"phones".cast("long")).as("n_phones"),
               count(when($"emails" + $"urls" + $"phones" > 0, 1))
                 .as("docs_with_pii"))
      },
      Some(raw"""
        WITH counts AS (
          SELECT lang,
                 len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails,
                 len(regexp_extract_all(text, 'https?://[^\s]+')) AS urls,
                 len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS phones
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(emails) AS BIGINT) AS n_emails,
               CAST(SUM(urls) AS BIGINT) AS n_urls,
               CAST(SUM(phones) AS BIGINT) AS n_phones,
               COUNT(CASE WHEN emails + urls + phones > 0 THEN 1 END) AS docs_with_pii
        FROM counts GROUP BY lang""")),

    QueryDef(
      "curate_decontaminate",
      (s, dir) => {
        import s.implicits._
        // benchmark = a deterministic holdout slice; flag corpus docs
        // sharing any word 5-gram with it (bench grams broadcast; the
        // corpus is scanned once and never shuffled)
        val docs = t(s, dir, "documents")
        val bench = docs.filter($"doc_id" % 100 < 2)
        val corpus = docs.filter($"doc_id" % 100 >= 2)
        Curation.decontaminate(corpus, "doc_id", "text", bench, "text", n = 5)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               count(when($"contaminated", 1)).as("n_contaminated"),
               sum(when($"contaminated", $"doc_id")).as("sum_contaminated_ids"))
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents
        ), grams AS (
          SELECT doc_id, [array_to_string(t[i:i+4], ' ')
                          for i in range(1, len(t) - 3)] AS gs
          FROM toks WHERE len(t) >= 5
        ), ex AS (
          SELECT doc_id, unnest(gs) AS g FROM grams
        ), bench AS (
          SELECT DISTINCT g FROM ex WHERE doc_id % 100 < 2
        ), hits AS (
          SELECT DISTINCT e.doc_id FROM ex e JOIN bench b USING (g)
          WHERE e.doc_id % 100 >= 2
        )
        SELECT d.lang, COUNT(*) AS n_docs,
               COUNT(h.doc_id) AS n_contaminated,
               CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN d.doc_id END) AS BIGINT)
                 AS sum_contaminated_ids
        FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        WHERE d.doc_id % 100 >= 2
        GROUP BY d.lang""")),

    QueryDef(
      "dedup_clusters",
      (s, dir) => {
        import s.implicits._
        // pairwise near-dups → dedup GROUPS: connected components by
        // min-label propagation over the minhash pair set (same params as
        // dedup_minhash_lsh, so the edge set is that query's output)
        val pairs = Dedup.minhashLsh(t(s, dir, "documents"), "doc_id",
          "text", shingleWidth = 3, k = 12, bands = 4, threshold = 0.7)
        Dedup.connectedComponents(pairs.select($"i", $"j"))
          .groupBy($"cluster")
          .agg(count(lit(1)).as("n_members"),
               max($"id").as("max_id"),
               sum($"id").as("sum_ids"))
      },
      Some("""
        WITH RECURSIVE docs AS (
          SELECT doc_id AS id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks) - 1)]) AS shingles
          FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents)
          WHERE len(toks) >= 3
        ), mh AS (
          SELECT id, j, min(((2*j+1) * ${HASH32} + j*1000003) % 4294967311) AS m
          FROM (SELECT id, unnest(shingles) AS s FROM docs), range(0, 12) t(j)
          GROUP BY id, j
        ), bands AS (
          SELECT id, j // 3 AS band, string_agg(m, ',' ORDER BY j) AS key
          FROM mh GROUP BY id, j // 3
        ), cand AS (
          SELECT DISTINCT a.id AS i, b.id AS j
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.id < b.id
        ), pairs AS (
          SELECT c.i, c.j
          FROM cand c JOIN docs di ON di.id = c.i JOIN docs dj ON dj.id = c.j
          WHERE len(list_intersect(di.shingles, dj.shingles))::DOUBLE /
                (len(di.shingles) + len(dj.shingles)
                 - len(list_intersect(di.shingles, dj.shingles))) >= 0.7
        ), edges AS (
          SELECT i AS a, j AS b FROM pairs UNION SELECT j AS a, i AS b FROM pairs
        ), reach(id, lbl) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.id = e.b
        )
        SELECT cluster, COUNT(*) AS n_members, MAX(id) AS max_id,
               CAST(SUM(id) AS BIGINT) AS sum_ids
        FROM (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id) labeled
        GROUP BY cluster"""
        .replace("${HASH32}", duckHash32("s")))),

    // The END-TO-END near-dup pipeline a training corpus actually runs:
    // minhash/LSH candidate pairs → exact-jaccard verify → connected
    // components → keep each cluster's minimum id → corpus after dedup.
    // Every stage is the already-proven operator; this query wires them
    // and checks the SURVIVING corpus, not just the pair set.
    QueryDef(
      "dedup_pipeline",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
          shingleWidth = 3, k = 12, bands = 4, threshold = 0.7)
        val clusters = Dedup.connectedComponents(pairs.select($"i", $"j"))
        val dropped = clusters.filter($"id" =!= $"cluster")
          .select($"id".as("doc_id"))
        docs.join(dropped, Seq("doc_id"), "left_anti")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"n_chars".cast("long")).as("sum_chars"),
               sum($"doc_id").as("sum_ids"))
      },
      Some("""
        WITH RECURSIVE docs AS (
          SELECT doc_id AS id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks) - 1)]) AS shingles
          FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents)
          WHERE len(toks) >= 3
        ), mh AS (
          SELECT id, j, min(((2*j+1) * ${HASH32} + j*1000003) % 4294967311) AS m
          FROM (SELECT id, unnest(shingles) AS s FROM docs), range(0, 12) t(j)
          GROUP BY id, j
        ), bands AS (
          SELECT id, j // 3 AS band, string_agg(m, ',' ORDER BY j) AS key
          FROM mh GROUP BY id, j // 3
        ), cand AS (
          SELECT DISTINCT a.id AS i, b.id AS j
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.id < b.id
        ), pairs AS (
          SELECT c.i, c.j
          FROM cand c JOIN docs di ON di.id = c.i JOIN docs dj ON dj.id = c.j
          WHERE len(list_intersect(di.shingles, dj.shingles))::DOUBLE /
                (len(di.shingles) + len(dj.shingles)
                 - len(list_intersect(di.shingles, dj.shingles))) >= 0.7
        ), edges AS (
          SELECT i AS a, j AS b FROM pairs UNION SELECT j AS a, i AS b FROM pairs
        ), reach(id, lbl) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.id = e.b
        ), labeled AS (
          SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id
        ), dropped AS (
          SELECT id FROM labeled WHERE id <> cluster
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM documents
        WHERE doc_id NOT IN (SELECT id FROM dropped)
        GROUP BY lang"""
        .replace("${HASH32}", duckHash32("s")))),

    QueryDef(
      "curate_stratified_sample",
      (s, dir) => {
        import s.implicits._
        Curation.stratifiedSample(t(s, dir, "documents"),
            strataCol = "lang", idCol = "doc_id", n = 10, salt = "st")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"doc_id").as("sum_ids"),
               sum($"n_chars".cast("long")).as("sum_chars"))
      },
      Some(s"""
        WITH ranked AS (
          SELECT lang, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY ${duckHash32("'st' || ':' || CAST(doc_id AS VARCHAR)")},
                            doc_id) AS rk
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM ranked WHERE rk <= 10 GROUP BY lang""")),

    // Out-of-vocabulary rate against the corpus's own top-N vocabulary —
    // the tokenizer-coverage check run before committing to a vocab. The
    // vocabulary is top-k-bounded (driver-small by construction) and
    // broadcast; the corpus-side token stream joins against it without
    // shuffling the corpus.
    QueryDef(
      "text_oov_rate",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select($"lang", explode(tokens($"text")).as("tok"))
        val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
          .orderBy($"cnt".desc, $"tok".asc).limit(10)
          .select($"tok", lit(1).as("in_vocab"))
        toks.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy($"lang")
          .agg(count(lit(1)).as("total_tokens"),
               count(when($"in_vocab".isNull, 1)).as("oov_tokens"),
               (count(when($"in_vocab".isNull, 1)) * 10000L
                 / count(lit(1))).cast("long").as("oov_bps"))
      },
      Some(raw"""
        WITH toks AS (
          SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents),
        vocab AS (
          SELECT tok FROM (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok)
          ORDER BY cnt DESC, tok ASC LIMIT 10)
        SELECT lang, COUNT(*) AS total_tokens,
               COUNT(CASE WHEN v.tok IS NULL THEN 1 END) AS oov_tokens,
               CAST(COUNT(CASE WHEN v.tok IS NULL THEN 1 END) * 10000
                 // COUNT(*) AS BIGINT) AS oov_bps
        FROM toks t LEFT JOIN vocab v USING (tok)
        GROUP BY lang""")),

    QueryDef(
      "text_vocab_topk",
      (s, dir) => {
        import s.implicits._
        // exact per-language top-5 tokens: explode -> one shuffle-agg on
        // (lang, token) with map-side combine, then a rank window over the
        // DISTINCT-TOKEN counts (task state = one language's vocabulary,
        // not its corpus)
        val counts = t(s, dir, "documents")
          .select($"lang", explode(tokens($"text")).as("tok"))
          .groupBy($"lang", $"tok")
          .agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"lang")
          .orderBy($"cnt".desc, $"tok".asc)
        counts.withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
          .select($"lang", $"rank", $"tok", $"cnt")
      },
      Some(raw"""
        WITH toks AS (
          SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents),
        counts AS (
          SELECT lang, tok, COUNT(*) AS cnt FROM toks GROUP BY lang, tok),
        ranked AS (
          SELECT lang, tok, cnt,
                 ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY cnt DESC, tok ASC) AS rank
          FROM counts)
        SELECT lang, CAST(rank AS INT) AS rank, tok, cnt
        FROM ranked WHERE rank <= 5""")),

    // Vocabulary growth curve (Heaps' law view): docs in doc_id order,
    // sharded 50 apiece; each token charges its FIRST shard; per-shard
    // new-token counts cumulate into the running vocabulary size through
    // operators.PrefixSum (shard-div-8 buckets) — the corpus-ingestion
    // diagnostic dedup teams plot, with the cumulative sum distributed
    // instead of a single-partition window.
    QueryDef(
      "text_vocab_growth",
      (s, dir) => {
        import s.implicits._
        val firsts = t(s, dir, "documents")
          .select(expr("doc_id div 50").as("shard"),
            explode(tokens($"text")).as("tok"))
          .groupBy($"tok").agg(min($"shard").as("shard"))
        val newPerShard = firsts.groupBy($"shard")
          .agg(count(lit(1)).as("n_new"))
        graft.operators.PrefixSum.runningTotal(newPerShard,
          expr("shard div 8"), Seq($"shard".asc), $"n_new", "vocab_size")
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id // 50 AS shard,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents WHERE length(trim(text)) > 0
        ), firsts AS (
          SELECT tok, MIN(shard) AS shard FROM toks GROUP BY 1
        ), newper AS (
          SELECT shard, COUNT(*) AS n_new FROM firsts GROUP BY 1
        )
        SELECT shard, n_new,
               CAST(SUM(n_new) OVER (ORDER BY shard ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS vocab_size
        FROM newper""")),

    // Exact heavy hitters (tokens with > 1/k of all token occurrences)
    // via the Misra–Gries sketch + exact-verify two-pass: the sketch
    // bounds shuffle width at the CAPACITY, not the vocabulary, and the
    // decision filter cnt * k > n is pure integer arithmetic on exact
    // counts — the oracle needs no sketch mirror at all, which is the
    // point: the sketch only proposes, true counts decide.
    QueryDef(
      "text_heavy_hitters",
      (s, dir) => graft.operators.HeavyHitters.frequentTokens(
        t(s, dir, "documents"), "text", k = 100),
      Some(raw"""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents WHERE length(trim(text)) > 0),
        tot AS (SELECT COUNT(*) AS n FROM toks)
        SELECT tok, COUNT(*) AS cnt, n
        FROM toks, tot GROUP BY tok, n HAVING COUNT(*) * 100 > n""")),

    QueryDef(
      "curate_temperature_mix",
      (s, dir) => {
        import s.implicits._
        // T=2 rebalancing over the skewed lang distribution: rates derive
        // from observed counts (en downsamples toward the smallest lang);
        // the 0.5 exponent evaluates via IEEE-exact sqrt on both engines
        Curation.temperatureMix(t(s, dir, "documents"), "doc_id", "lang",
            temperature = 2.0, salt = "temp")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"n_chars".cast("long")).as("sum_chars"))
      },
      // floor(), not CAST: DuckDB's CAST(double AS BIGINT) rounds while
      // Spark's .cast("long") truncates — sqrt rates do not land on
      // integer cuts the way 0.25 does
      Some(s"""
        WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
             nm AS (SELECT MIN(n) AS nmin FROM counts),
             rates AS (SELECT lang, sqrt(nmin::DOUBLE / n::DOUBLE) AS rate
                       FROM counts, nm)
        SELECT d.lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE ${duckHash32("'temp' || ':' || CAST(doc_id AS VARCHAR)")} % 1000000 <
              CAST(floor(r.rate * 1000000) AS BIGINT)
        GROUP BY d.lang""")),

    QueryDef(
      "curate_domain_mix",
      (s, dir) => {
        import s.implicits._
        Curation.domainMix(t(s, dir, "documents"), "doc_id", "source",
            rates = Map("src0" -> 1.0, "src1" -> 1.0, "src2" -> 1.0,
              "src3" -> 1.0),
            defaultRate = 0.25, salt = "mix")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
               sum($"n_chars".cast("long")).as("sum_chars"))
      },
      // default rate 0.25 is EXACT in binary — both engines' rate*1e6
      // land on the same integer cut (never cut on a fraction that
      // rounds differently under truncation vs rounding casts)
      Some(s"""
        SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE ${duckHash32("'mix' || ':' || CAST(doc_id AS VARCHAR)")} % 1000000 <
              CAST((CASE WHEN source IN ('src0','src1','src2','src3')
                         THEN 1.0 ELSE 0.25 END) * 1000000 AS BIGINT)
        GROUP BY source""")),

    // Budget-constrained mixing: rates derive from a TOTAL token budget
    // and integer domain weights; the integer-exact cut arithmetic
    // (BigInt vs HUGEINT) makes the keep decision bit-identical — both
    // engines floor-divide the same products.
    QueryDef(
      "curate_budget_mix",
      (s, dir) => {
        import s.implicits._
        Curation.budgetMix(t(s, dir, "documents"), "doc_id", "source",
            "n_chars", budget = 10000,
            weights = Map("src0" -> 3L, "src1" -> 1L, "src2" -> 2L,
              "src5" -> 5L), salt = "budget")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
               sum($"n_chars".cast("long")).as("sum_chars"))
      },
      Some(s"""
        WITH w(dom, wgt) AS (
          VALUES ('src0', 3), ('src1', 1), ('src2', 2), ('src5', 5)),
        tot AS (
          SELECT source, CAST(SUM(n_chars) AS BIGINT) AS toks
          FROM documents GROUP BY source),
        cuts AS (
          SELECT t.source,
                 LEAST(CAST(1000000 AS HUGEINT),
                       CAST(10000 AS HUGEINT) * w.wgt * 1000000 /
                         (11 * t.toks)) AS cut
          FROM tot t JOIN w ON w.dom = t.source
          WHERE t.toks > 0 AND w.wgt > 0)
        SELECT d.source, COUNT(*) AS n_docs,
               CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
        FROM documents d JOIN cuts c ON c.source = d.source
        WHERE ${duckHash32("'budget' || ':' || CAST(d.doc_id AS VARCHAR)")}
              % 1000000 < c.cut
        GROUP BY d.source""")),

    // CCNet-style line-level dedup ([[Dedup.lineDedup]]): the corpus has
    // no newlines, so "lines" are synthesized as non-overlapping 10-token
    // chunks (the chunking operator) — near-dup documents make chunk
    // content repeat across docs, which is the boilerplate signal the
    // operator strips at scale.
    QueryDef(
      "dedup_lines",
      (s, dir) => {
        import s.implicits._
        val lines = Curation.chunkWithOverlap(
          t(s, dir, "documents").select($"doc_id", $"source", $"text"),
          "text", chunkTokens = 10, overlap = 0)
        Dedup.lineDedup(lines, "chunk_text")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_lines"),
               count(when($"line_occ" >= 2, 1)).as("n_dup_lines"),
               countDistinct(when($"line_occ" >= 2, $"doc_id"))
                 .as("n_docs_with_dup"))
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS tk
          FROM documents),
        starts AS (
          SELECT doc_id, source, tk,
                 unnest(range(0, greatest(len(tk) - 1, 0) + 1, 10)) AS s
          FROM toks),
        lines AS (
          SELECT doc_id, source,
                 array_to_string(tk[s + 1 : s + 10], ' ') AS line
          FROM starts),
        occ AS (
          SELECT ${duckHash60("trim(line)")} AS lh, COUNT(*) AS line_occ
          FROM lines WHERE length(trim(line)) > 0 GROUP BY 1)
        SELECT source, COUNT(*) AS n_lines,
               COUNT(CASE WHEN COALESCE(line_occ, 1) >= 2 THEN 1 END)
                 AS n_dup_lines,
               COUNT(DISTINCT CASE WHEN COALESCE(line_occ, 1) >= 2
                                   THEN doc_id END) AS n_docs_with_dup
        FROM lines l LEFT JOIN occ
          ON length(trim(l.line)) > 0 AND occ.lh = ${duckHash60("trim(l.line)")}
        GROUP BY source""")),

    // Interpolated bigram-LM typicality — the CCNet/KenLM quality-filter
    // shape with exact cross-engine arithmetic: per bigram position,
    // p = λ·c2(prev,next)/c1(prev) + (1-λ)·cu(next)/N with λ = 0.5
    // (exact in binary; each intermediate is one IEEE op mirrored
    // verbatim in the oracle — log-probabilities are NOT reproducible
    // across libms, ratios are). Scale shape: one explode into bigram
    // positions, two map-side-combinable counts, hash joins back on the
    // bigram/prefix keys, one per-doc DECIMAL sum — nothing global but
    // the vocabulary-sized count frames.
    QueryDef(
      "text_bigram_lm",
      (s, dir) => {
        import s.implicits._
        val toksDf = t(s, dir, "documents")
          .select($"doc_id", $"lang", tokens(lower($"text")).as("tk"))
        val pos = toksDf.select($"doc_id", explode($"tk").as("w"))
        val uni = pos.groupBy($"w").agg(count(lit(1)).as("cu"))
        val tot = pos.agg(count(lit(1)).as("n_tokens"))
        val bg = toksDf.filter(size($"tk") >= 2)
          .select($"doc_id", $"lang", explode(zip_with(
            slice($"tk", lit(1), size($"tk") - 1),
            slice($"tk", lit(2), size($"tk") - 1),
            (a, b) => struct(a.as("p"), b.as("n")))).as("z"))
          .select($"doc_id", $"lang",
            $"z.p".as("w_prev"), $"z.n".as("w_next"))
        val c2 = bg.groupBy($"w_prev", $"w_next").agg(count(lit(1)).as("cnt2"))
        val c1 = bg.groupBy($"w_prev").agg(count(lit(1)).as("cnt1"))
        val perPos = bg
          .join(c2, Seq("w_prev", "w_next"))
          .join(c1, Seq("w_prev"))
          .join(uni.withColumnRenamed("w", "w_next"), Seq("w_next"))
          .crossJoin(broadcast(tot))
          .select($"doc_id", $"lang",
            (lit(0.5) * ($"cnt2".cast("double") / $"cnt1".cast("double")) +
             lit(0.5) * ($"cu".cast("double") / $"n_tokens".cast("double")))
              .cast(DecimalType(18, 9)).as("p"))
        val perDoc = perPos.groupBy($"doc_id", $"lang")
          .agg(sum($"p").as("score_dec"), count(lit(1)).as("n_bigrams"))
        perDoc.groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
               sum($"score_dec").cast("double").as("sum_interp"),
               count(when($"score_dec".cast("double")
                 / $"n_bigrams".cast("double") < 0.034, 1)).as("n_atypical"))
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id, lang,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
          FROM documents),
        pos AS (SELECT doc_id, unnest(tk) AS w FROM toks),
        uni AS (SELECT w, COUNT(*) AS cu FROM pos GROUP BY w),
        tot AS (SELECT COUNT(*) AS n_tokens FROM pos),
        idx AS (
          SELECT doc_id, lang, tk, unnest(range(1, len(tk))) AS i
          FROM toks WHERE len(tk) >= 2),
        bg AS (
          SELECT doc_id, lang, tk[i] AS w_prev, tk[i + 1] AS w_next FROM idx),
        c2 AS (SELECT w_prev, w_next, COUNT(*) AS cnt2 FROM bg GROUP BY 1, 2),
        c1 AS (SELECT w_prev, COUNT(*) AS cnt1 FROM bg GROUP BY 1),
        perpos AS (
          SELECT b.doc_id, b.lang,
                 CAST(0.5 * (c2.cnt2::DOUBLE / c1.cnt1::DOUBLE) +
                      0.5 * (u.cu::DOUBLE / t.n_tokens::DOUBLE)
                   AS DECIMAL(18, 9)) AS p
          FROM bg b JOIN c2 USING (w_prev, w_next) JOIN c1 USING (w_prev)
               JOIN uni u ON u.w = b.w_next, tot t),
        perdoc AS (
          SELECT doc_id, lang, SUM(p) AS score_dec, COUNT(*) AS n_bigrams
          FROM perpos GROUP BY 1, 2)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(score_dec) AS DOUBLE) AS sum_interp,
               COUNT(CASE WHEN CAST(score_dec AS DOUBLE) / n_bigrams < 0.034
                          THEN 1 END) AS n_atypical
        FROM perdoc GROUP BY lang""")),

    // Keyword relevance search ([[Search.bm25TopK]]): rational-idf BM25
    // top-k per query, deterministic tie-break by doc_id.
    QueryDef(
      "text_bm25_topk",
      (s, dir) => {
        Search.bm25TopK(s, t(s, dir, "documents"), "doc_id", "text",
          queries = bm25Queries, k = 5)
      },
      Some(bm25OracleSql)),

    // The same ranking served from the PERSISTED inverted-index artifact
    // ([[Search.bm25TopKIndexed]] over the [[IndexCache]]-warmed build):
    // the oracle replays the ad-hoc computation, so a hash match proves
    // the build/probe split loses nothing — the artifact IS the corpus
    // as far as scoring is concerned. Probe-only timing; the build cost
    // is measured by `text_bm25_index_build`.
    QueryDef(
      "text_bm25_indexed",
      (s, dir) =>
        Search.bm25TopKIndexed(s, IndexCache.bm25Index(s, dir),
          bm25Queries, k = 5),
      Some(bm25OracleSql)),

    // The artifact build, timed alone (the nightly job a production
    // corpus amortizes): always builds fresh, then proves artifact
    // integrity by reading df/tf PER QUERY TERM back from the postings
    // table only — the oracle recomputes them from raw text.
    QueryDef(
      "text_bm25_index_build",
      (s, dir) => {
        import s.implicits._
        val path = Tables.tmpDir("bm25_build")
        Search.buildPostingsIndex(s, t(s, dir, "documents"),
          "doc_id", "text", path)
        val terms = bm25Queries.flatMap(_._2).distinct
        graft.delta.DeltaTable.forPath(s, s"$path/postings").toDF
          .filter($"term".isin(terms: _*))
          .groupBy($"term")
          .agg(count(lit(1)).as("df"),
               sum($"tf".cast("long")).as("total_tf"))
      },
      Some(raw"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
          FROM documents),
        pos AS (SELECT doc_id, unnest(tk) AS term FROM toks)
        SELECT term, COUNT(DISTINCT doc_id) AS df,
               CAST(COUNT(*) AS BIGINT) AS total_tf
        FROM pos
        WHERE term IN ('join', 'hash', 'merge', 'scan', 'filter',
                       'vector', 'window', 'stream')
        GROUP BY term""")),

    // Hybrid retrieval ([[Search.rrfFuse]]): a BM25 keyword run and a
    // brute-force cosine run (documents and embeddings share the id
    // space) fused by reciprocal-rank — the standard two-tower serving
    // shape. RRF contributions are scaled-integer (1e9 DIV (60 + rank)),
    // so the fused scores are exact BIGINT sums: the oracle replays both
    // retrievers AND the fusion with zero float-summation risk.
    QueryDef(
      "search_hybrid_rrf",
      (s, dir) => {
        import s.implicits._
        val lex = Search.bm25TopK(s, t(s, dir, "documents"),
          "doc_id", "text", bm25Queries, k = 20)
        val emb = t(s, dir, "embeddings")
        val vec = Similarity.bruteForceTopK(emb,
            emb.filter($"vec_id".isin(3L, 5L, 7L)),
            "vec_id", "embedding", k = 20)
          .select(
            when($"query_id" === 3L, "q_join")
              .when($"query_id" === 5L, "q_scan")
              .otherwise("q_rare").as("query_id"),
            $"neighbor_id".as("doc_id"), $"rank")
        Search.rrfFuse(Seq(lex, vec), k = 5)
      },
      Some(hybridRrfOracleSql)),

    // Deterministic training-order shuffle ([[Curation.shuffleShard]]):
    // seeded hash permutation + sharding — the reproducible read order a
    // training run consumes; the oracle replays the hash, shard modulo,
    // and within-shard rank exactly.
    QueryDef(
      "curate_shuffle_shard",
      (s, dir) => {
        import s.implicits._
        Curation.shuffleShard(t(s, dir, "documents"), "doc_id",
            seed = "ep1", numShards = 8)
          .select($"shard", $"pos", $"doc_id")
      },
      Some(s"""
        WITH h AS (
          SELECT doc_id,
                 ${duckHash32("'ep1:' || CAST(doc_id AS VARCHAR)")} AS oh
          FROM documents)
        SELECT CAST(oh % 8 AS INT) AS shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY oh % 8
                 ORDER BY oh, doc_id) AS INT) AS pos,
               doc_id
        FROM h""")),

    // Corpus length distribution ([[CorpusStats.discreteQuantiles]]):
    // the numbers a filtering pass's thresholds are picked from.
    // Discrete (type-1) quantiles select ACTUAL corpus values by rank
    // ceil(p*n) — integer logic after one shared IEEE multiply, no
    // interpolation blend to drift cross-engine.
    QueryDef(
      "text_length_quantiles",
      (s, dir) => CorpusStats.discreteQuantiles(
        t(s, dir, "documents"), "lang", "n_chars",
        Seq(0.5, 0.9, 0.99)),
      Some("""
        WITH ranked AS (
          SELECT lang, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM documents)
        SELECT lang, CAST(MAX(n) AS BIGINT) AS n,
               MAX(CASE WHEN rn = CEIL(CAST(0.5 AS DOUBLE) * n)
                        THEN n_chars END) AS q_500,
               MAX(CASE WHEN rn = CEIL(CAST(0.9 AS DOUBLE) * n)
                        THEN n_chars END) AS q_900,
               MAX(CASE WHEN rn = CEIL(CAST(0.99 AS DOUBLE) * n)
                        THEN n_chars END) AS q_990
        FROM ranked
        WHERE rn = CEIL(CAST(0.5 AS DOUBLE) * n)
           OR rn = CEIL(CAST(0.9 AS DOUBLE) * n)
           OR rn = CEIL(CAST(0.99 AS DOUBLE) * n)
        GROUP BY lang"""))
  )

  // lazy: referenced by `defs` above, which initializes first
  private lazy val bm25Queries: Seq[(String, Seq[String])] = Seq(
    "q_join" -> Seq("join", "hash", "merge"),
    "q_scan" -> Seq("scan", "filter"),
    "q_rare" -> Seq("vector", "window", "stream"))

  private lazy val bm25OracleSql: String = raw"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
          FROM documents),
        dls AS (SELECT doc_id, len(tk) AS dl FROM toks),
        stats AS (
          SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_tokens
          FROM dls),
        q(query_id, term) AS (VALUES
          ('q_join', 'join'), ('q_join', 'hash'), ('q_join', 'merge'),
          ('q_scan', 'scan'), ('q_scan', 'filter'),
          ('q_rare', 'vector'), ('q_rare', 'window'), ('q_rare', 'stream')),
        tf AS (
          SELECT t.doc_id, d.dl, u.term, COUNT(*) AS tf
          FROM toks t JOIN dls d USING (doc_id), unnest(t.tk) AS u(term)
          WHERE u.term IN (SELECT term FROM q)
          GROUP BY t.doc_id, d.dl, u.term),
        dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        contrib AS (
          SELECT q.query_id, tf.doc_id,
                 CAST(((s.n_docs::DOUBLE - f.df::DOUBLE + 0.5) /
                         (f.df::DOUBLE + 0.5)) *
                      (tf.tf::DOUBLE * 2.25) /
                      (tf.tf::DOUBLE + 1.25 * (1.0 - 0.75 + 0.75 *
                        (tf.dl::DOUBLE /
                          (s.total_tokens::DOUBLE / s.n_docs::DOUBLE))))
                   AS DECIMAL(18, 9)) AS c
          FROM tf JOIN dfreq f USING (term) JOIN q ON q.term = tf.term, stats s),
        scored AS (
          SELECT query_id, doc_id, SUM(c) AS score_dec
          FROM contrib GROUP BY 1, 2),
        ranked AS (
          SELECT query_id, doc_id, score_dec,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score_dec DESC, doc_id) AS rank
          FROM scored)
        SELECT query_id, CAST(rank AS INT) AS rank, doc_id,
               CAST(score_dec AS DOUBLE) AS score
        FROM ranked WHERE rank <= 5"""

  /** The hybrid oracle replays BOTH retrieval runs at depth 20 (the BM25
    * chain above, the brute-force cosine chain from the ann oracles) and
    * the scaled-integer RRF fold — `//` is DuckDB's integer division,
    * mirroring Spark's `DIV`. */
  private lazy val hybridRrfOracleSql: String = raw"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS tk
          FROM documents),
        dls AS (SELECT doc_id, len(tk) AS dl FROM toks),
        stats AS (
          SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_tokens
          FROM dls),
        q(query_id, term) AS (VALUES
          ('q_join', 'join'), ('q_join', 'hash'), ('q_join', 'merge'),
          ('q_scan', 'scan'), ('q_scan', 'filter'),
          ('q_rare', 'vector'), ('q_rare', 'window'), ('q_rare', 'stream')),
        tf AS (
          SELECT t.doc_id, d.dl, u.term, COUNT(*) AS tf
          FROM toks t JOIN dls d USING (doc_id), unnest(t.tk) AS u(term)
          WHERE u.term IN (SELECT term FROM q)
          GROUP BY t.doc_id, d.dl, u.term),
        dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        contrib AS (
          SELECT q.query_id, tf.doc_id,
                 CAST(((s.n_docs::DOUBLE - f.df::DOUBLE + 0.5) /
                         (f.df::DOUBLE + 0.5)) *
                      (tf.tf::DOUBLE * 2.25) /
                      (tf.tf::DOUBLE + 1.25 * (1.0 - 0.75 + 0.75 *
                        (tf.dl::DOUBLE /
                          (s.total_tokens::DOUBLE / s.n_docs::DOUBLE))))
                   AS DECIMAL(18, 9)) AS c
          FROM tf JOIN dfreq f USING (term) JOIN q ON q.term = tf.term, stats s),
        lexscored AS (
          SELECT query_id, doc_id, SUM(c) AS score_dec
          FROM contrib GROUP BY 1, 2),
        lex AS (
          SELECT query_id, doc_id, rank FROM (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY score_dec DESC, doc_id) AS rank
            FROM lexscored) t WHERE rank <= 20),
        qv AS (SELECT vec_id AS qid, embedding AS qvec
               FROM embeddings WHERE vec_id IN (3, 5, 7)),
        vscored AS (
          SELECT qv.qid, c.vec_id AS doc_id,
                 round(${duckDot("qv.qvec", "c.embedding")} /
                       (sqrt(${duckDot("qv.qvec", "qv.qvec")}) *
                        sqrt(${duckDot("c.embedding", "c.embedding")})), 6)
                   AS cosine
          FROM embeddings c, qv WHERE c.vec_id <> qv.qid),
        vec AS (
          SELECT CASE qid WHEN 3 THEN 'q_join' WHEN 5 THEN 'q_scan'
                          ELSE 'q_rare' END AS query_id, doc_id, rank FROM (
            SELECT qid, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY cosine DESC, doc_id) AS rank
            FROM vscored) t WHERE rank <= 20),
        fused AS (
          SELECT query_id, doc_id,
                 CAST(SUM(1000000000 // (60 + rank)) AS BIGINT) AS rrf_score
          FROM (SELECT * FROM lex UNION ALL SELECT * FROM vec)
          GROUP BY 1, 2)
        SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf_score FROM (
          SELECT query_id, doc_id, rrf_score,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY rrf_score DESC, doc_id) AS rank
          FROM fused) t WHERE rank <= 5"""
}
