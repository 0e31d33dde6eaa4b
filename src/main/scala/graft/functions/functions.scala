package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks for the data-pipeline operators
  * (dedup, similarity, text analysis).
  *
  * Everything here composes Spark's codegen'd `functions._` — no Scala
  * UDFs — so the expressions stay inside whole-stage codegen and push into
  * the columnar scan. Cross-engine determinism notes (for the DuckDB
  * oracle) are on each function: higher-order folds run left-to-right in
  * array order in both engines, so double arithmetic produces bit-identical
  * results.
  */
package object functions {

  /** Whitespace tokens of trimmed text; empty string → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count (whitespace segmentation). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** First 8 hex chars of md5 as a non-negative long — the deterministic
    * 32-bit hash family used by minhash (seeded via prefix). Computed by
    * the digest-direct [[Md5Prefix]] (≡ `conv(substring(md5(x),1,8),16,10)`,
    * the form the DuckDB oracles mirror). */
  def md5Hash32(c: Column, seed: Column): Column =
    Md5Prefix(concat(seed.cast("string"), lit(":"), c), 8)

  /** Unseeded 32-bit md5 hash. The minhash family derives its k hash
    * functions from this ONE digest via affine transforms
    * `(a_j·h + b_j) mod p` — k times cheaper than k seeded digests, and
    * the classic universal-hashing construction. */
  def md5Hash32(c: Column): Column = Md5Prefix(c, 8)

  /** Prime modulus for the affine minhash family (smallest prime > 2^32,
    * so a_j·h + b_j stays far below Long overflow). */
  val MinhashPrime = 4294967311L
  def minhashA(j: Int): Long = 2L * j + 1
  def minhashB(j: Int): Long = j * 1000003L

  /** First 15 hex chars of md5 as a 60-bit non-negative long (fits a
    * signed 64-bit int in both engines). */
  def md5Hash60(c: Column): Column = Md5Prefix(c, 15)

  /** Word n-gram shingles (distinct), the unit of minhash/jaccard.
    *
    * PERFORMANCE: higher-order lambdas evaluate interpreted with no
    * common-subexpression reuse, so every element access re-evaluates its
    * argument subtree. Pass a MATERIALIZED tokens column (an alias from a
    * previous select), never `tokens(text)` inline — otherwise the split
    * re-runs once per shingle element. */
  def wordShinglesOf(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))

  /** Word n-gram shingles straight from text — convenient for small data;
    * prefer `tokens(...).as("toks")` + [[wordShinglesOf]] on large corpora
    * (see the performance note there). */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesOf(tokens(text), n)

  /** Character n-gram shingles (distinct). */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n)))))

  /** MinHash signature: for each seed j in [0, k), the minimum
    * `md5Hash32(shingle, j)` over the shingle set. Returns array<long>
    * of length k (null-free; empty shingles → array of Long.MaxValue). */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      coalesce(array_min(transform(shingles, s => md5Hash32(s, j))),
        lit(Long.MaxValue)))

  /** SimHash over the token multiset, `bits` wide (≤ 60): sign of the
    * per-bit vote of each token's 60-bit md5 hash, folded MSB-first into
    * a long. */
  def simhash(text: Column, bits: Int): Column = {
    require(bits <= 60, "simhash width must fit the 60-bit hash")
    val toks = tokens(text)
    val hashes = transform(toks, t => md5Hash60(t))
    val bitsArr = transform(sequence(lit(0), lit(bits - 1)), i =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftrightCol(h, i).bitwiseAND(lit(1L)) * 2 - 1)) > 0,
        lit(1L)).otherwise(lit(0L)))
    aggregate(bitsArr, lit(0L), (acc, b) => acc * 2 + b)
  }

  /** shiftright with a Column shift amount (the Scala `shiftright` helper
    * only accepts a literal Int; the SQL function accepts any expression). */
  def shiftrightCol(v: Column, amount: Column): Column =
    call_function("shiftright", v, amount)

  /** Hamming distance between two simhash longs. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of two pre-distinct shingle arrays, as the exact
    * ratio of intersection to union sizes (integer division → double,
    * bit-identical across engines). The intersection is built once and
    * shared between numerator and denominator. */
  def jaccard(a: Column, b: Column): Column = {
    val df = org.apache.spark.sql.functions
    val expr = (i: Column) =>
      i.cast("double") / (size(a) + size(b) - i).cast("double")
    // route the shared subexpression through a lambda variable so it is
    // evaluated a single time even without codegen CSE
    df.aggregate(df.array(size(array_intersect(a, b))), lit(0.0),
      (_, i) => expr(i))
  }

  /** Dot product of two float vectors, accumulated in doubles in element
    * order (matches a left-fold in any engine). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two float vectors. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (sqrt(dotProduct(a, a)) * sqrt(dotProduct(b, b)))

  /** Polynomial rolling hash of the text's characters mod 1e9+7 — a
    * compact content fingerprint with a trivially mirrorable definition. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(filter(split(text, ""), c => length(c) > 0),
        c => ascii(c).cast("long")),
      lit(0L), (acc, x) => (acc * 31 + x) % 1000000007L)

  /** BPE-style pre-tokenizer count: letter runs, digit runs, and single
    * punctuation marks each count as one token (the GPT-2-ish pre-merge
    * segmentation, minus byte-level details). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"""), lit(0)))

  /** Stopword-ratio style quality features; `stopwords` must be lowercase. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => t.isin(stopwords: _*)))
}
