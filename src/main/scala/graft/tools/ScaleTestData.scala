package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scaler for SCALING measurements (VERDICT r8 #2):
  * replicates `documents` / `embeddings` `factor`x so the pipeline tier
  * can be timed at sf1 (= 10x sf0.1) without the driver-side generator.
  *
  * Shard construction preserves the LOCAL structure of the corpus so a
  * linear-runtime expectation is fair:
  *
  *  - documents: shard 0 is the original; shard i applies a Caesar
  *    rotation by i to the letters (a bijective per-character map via
  *    `translate`), so EVERY in-shard relation — char shingles, word
  *    shingles, token counts, lengths — mirrors the original exactly,
  *    while cross-shard CHARACTER n-grams are disjoint (a token-suffix
  *    scheme tried first left cross-shard docs char-trigram near-dups of
  *    each other, inflating ngram-jaccard output ~45x/doc — a quadratic
  *    blow-up no real 10x corpus has; rotation kills it at the char
  *    level, which subsumes the word level).
  *  - embeddings: shard i flips each dimension's sign by
  *    `hash(dim, shard) % 2` — a Rademacher reflection, so in-shard
  *    distances and norms are EXACTLY the original's and cross-shard
  *    cosines decorrelate, again mirroring "10x more data" rather than
  *    "the same data 10 times".
  *
  * Ids offset by shard * 100M; everything is a pure function of the
  * input — rerunning reproduces the same bytes (no Date.now/random).
  *
  * Usage: runMain graft.tools.ScaleTestData <inDir> <outDir> <factor>
  */
object ScaleTestData {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleTestData <inDir> <outDir> <factor>")
    val Array(in, out, f) = args
    val factor = f.toInt
    require(factor >= 1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val off = 100000000L

    val docs = spark.read.parquet(s"$in/documents.parquet")
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def rot(a: String, k: Int) = a.drop(k % 26) + a.take(k % 26)
    def docShard(s: Int): DataFrame =
      if (s == 0) docs
      else docs.select(
        (col("doc_id") + lit(s * off)).as("doc_id"),
        translate(col("text"), lower + upper,
          rot(lower, s) + rot(upper, s)).as("text"),
        col("lang"), col("source"),
        col("n_chars")) // translate is length-preserving
    (0 until factor).map(docShard).reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val embs = spark.read.parquet(s"$in/embeddings.parquet")
    def embShard(s: Int): DataFrame =
      if (s == 0) embs
      else embs.select(
        (col("vec_id") + lit(s * off)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(pmod(hash(i, lit(s)), lit(2)) === 0, x)
            .otherwise(-x)).as("embedding"),
        col("label"))
    (0 until factor).map(embShard).reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"""{"documents":${factor * docs.count()},"embeddings":${factor * embs.count()},"out":"$out"}""")
    spark.stop()
  }
}
