package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * Scale design (the 100 TB story):
  *  - nothing here compares all pairs: every near-dup variant generates
  *    CANDIDATE pairs through a bucketing key (LSH band, simhash band,
  *    length bucket) and only verifies candidates — the shuffle volume is
  *    O(docs × bands), not O(docs²);
  *  - all similarity math is codegen'd column expressions (no UDFs), so
  *    it runs inside whole-stage codegen next to the parquet scan;
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

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline: shingle → k-minhash signature → split into `bands` bands of
    * k/bands rows → self-join on (band index, band key) → exact jaccard
    * verification at `threshold`. Classic banding probability: a pair with
    * jaccard j is a candidate with p = 1-(1-j^r)^b.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleWidth: Int = 3, k: Int = 12, bands: Int = 4,
                 threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0, "k must divide evenly into bands")
    val rows = k / bands
    val docs = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleWidth).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minhashSignature(col("shingles"), k))

    val banded = docs.select(col("id"), col("shingles"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"),
            concat_ws(",", transform(slice(col("sig"), b * rows + 1, lit(rows)),
              x => x.cast("string"))).as("key"))))
          .as("bk"))
      .select(col("id"), col("shingles"), col("bk.band"), col("bk.key"))

    val l = banded.select(col("band"), col("key"), col("id").as("i"),
      col("shingles").as("sh_i"))
    val r = banded.select(col("band"), col("key"), col("id").as("j"),
      col("shingles").as("sh_j"))
    l.join(r, Seq("band", "key"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"), jaccard(col("sh_i"), col("sh_j")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-duplicate pairs: `bits`-wide simhash, banded into
    * `bands` contiguous bit slices; pairs sharing any band are verified by
    * full hamming distance ≤ `maxDistance`. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bits: Int = 60, bands: Int = 4,
                   maxDistance: Int = 8): DataFrame = {
    require(bits % bands == 0)
    val width = bits / bands
    val mask = (1L << width) - 1
    val hashed = df.select(col(idCol).as("id"),
      graft.functions.simhash(col(textCol), bits).as("h"))
    val banded = hashed.select(col("id"), col("h"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          graft.functions.shiftrightCol(col("h"), b * width)
            .bitwiseAND(lit(mask)).as("key"))))
        .as("bk"))
      .select(col("id"), col("h"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("band"), col("key"), col("id").as("i"), col("h").as("h_i"))
    val r = banded.select(col("band"), col("key"), col("id").as("j"), col("h").as("h_j"))
    l.join(r, Seq("band", "key"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        hammingDistance(col("h_i"), col("h_j")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** Character-n-gram jaccard near-dup pairs, blocked by a coarse length
    * bucket (near-dups have near-equal lengths; candidates only form
    * within a bucket and its neighbor). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.8,
                   lengthBucket: Int = 32): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
        charShingles(col(textCol), n).as("grams"),
        floor(length(col(textCol)) / lengthBucket).cast("int").as("bucket"))
    // neighbor buckets: each doc lands in its own and the next bucket, so
    // pairs straddling a boundary still meet (standard blocking trick)
    val blocked = docs.select(col("id"), col("grams"),
      explode(array(col("bucket"), col("bucket") + 1)).as("blk"))
    val l = blocked.select(col("blk"), col("id").as("i"), col("grams").as("g_i"))
    val r = blocked.select(col("blk"), col("id").as("j"), col("grams").as("g_j"))
    l.join(r, Seq("blk"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"), jaccard(col("g_i"), col("g_j")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-duplicate pairs above a cosine threshold, blocked by a
    * shared coarse key (e.g. an LSH sign-bucket or cluster id) to avoid the
    * all-pairs product at scale. */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                           blockCol: Column, threshold: Double): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      blockCol.as("blk"))
    val l = vecs.select(col("blk"), col("id").as("i"), col("v").as("v_i"))
    val r = vecs.select(col("blk"), col("id").as("j"), col("v").as("v_j"))
    l.join(r, Seq("blk"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        round(cosineSimilarity(col("v_i"), col("v_j")), 6).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }
}
