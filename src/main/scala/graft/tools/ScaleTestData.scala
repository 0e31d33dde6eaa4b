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
      // events.ts may be TIMESTAMP(NANOS) depending on driver generation;
      // read as long-of-nanos then (graft.queries.Tables.t converts on
      // the query side either way)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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

    // RELATIONAL tables (r10 VERDICT #1): the delta_* lifecycle family
    // reads lineitem/orders/customer/..., so a 10x delta-tier measurement
    // needs those at 10x too (the r9 run symlinked them — pipeline-tier
    // only). Shard i offsets every KEY column by i*100M, leaving values
    // and dates untouched: per-shard FK structure (orders↔lineitem↔
    // customer/part/supplier) mirrors the original exactly, cross-shard
    // keys are disjoint, and date-derived partition layouts keep the
    // same partition COUNT with 10x rows per partition — "the same
    // workload, 10x the data", which is the fairness a linear-runtime
    // expectation needs. region/nation are dimension tables a real 10x
    // corpus would NOT grow; they copy through unscaled.
    val keyCols: Map[String, Seq[String]] = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "events" -> Seq("event_id", "user_id"))
    val counts = keyCols.toSeq.sortBy(_._1).map { case (name, keys) =>
      val base = spark.read.parquet(s"$in/$name.parquet")
      def shard(s: Int): DataFrame =
        if (s == 0) base
        else keys.foldLeft(base)((d, k) =>
          d.withColumn(k, col(k) + lit(s * off)))
      (0 until factor).map(shard).reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      name -> factor * base.count()
    }
    Seq("region", "nation").foreach { name =>
      spark.read.parquet(s"$in/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }

    val relJson = counts.map { case (n, c) => s""""$n":$c""" }.mkString(",")
    println(s"""{"documents":${factor * docs.count()},"embeddings":${factor * embs.count()},$relJson,"out":"$out"}""")
    spark.stop()
  }
}
