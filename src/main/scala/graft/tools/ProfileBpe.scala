package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Bpe

/** Throwaway timing harness for the BPE driver fast path at production
  * merge counts (the round-7 weak flag asked for a NOTES number at
  * k >= 1000 showing seconds, not hours). Trains over the sf documents
  * table; prints dictionary size and wall time per k. */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.persist().count()
    Seq(100, 1000).foreach { k =>
      val t0 = System.nanoTime()
      val n = Bpe.trainMerges(docs, "text", k).count()
      println(f"PROFILE bpe-docs k=$k merges=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // the sf documents vocabulary exhausts at ~90 merges; synthesize a
    // production-shaped dictionary instead — Zipf-weighted syllable words
    // (natural-language skew, deep merge structure) to stress k at
    // tokenizer scale
    val syll = Array("th", "he", "in", "er", "an", "re", "on", "at", "en",
      "nd", "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
      "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le", "ve",
      "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea", "ra", "ce",
      "li", "ch", "ll", "be", "ma", "si", "om", "ur")
    // distinct by construction: word i = base-50 syllable expansion of i
    // (syllables recur massively, so the pair structure is deep), with
    // Zipf-distributed word frequencies
    val dictWords = (0 until 400000).map { i =>
      val sb = new StringBuilder
      var v = i + 50 // ≥2 syllables
      while (v > 0) { sb.append(syll(v % syll.length)); v /= syll.length }
      (sb.toString, (1 + 1000000 / (i + 1)).toLong)
    }
    // train straight on the weighted dictionary through the
    // package-private fast path (what trainMerges reduces to anyway)
    val dict = dictWords.groupBy(_._1).map { case (w, ws) =>
      (w, ws.map(_._2).sum) }.toArray
    println(s"PROFILE dict distinct=${dict.length}")
    Seq(1000, 8000, 32000).foreach { k =>
      val t0 = System.nanoTime()
      val n = Bpe.trainMergesLocal(dict, k).size
      println(f"PROFILE bpe-zipf k=$k merges=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // segmentation at production k over the sf documents: one projection
    // through the native expression regardless of k (the replace-chain
    // would be k projections)
    val merges32k = Bpe.trainMergesLocal(dict, 32000)
      .map { case (_, a, b, _) => (a, b) }
    Seq(1000, 32000).foreach { k =>
      val t0 = System.nanoTime()
      val rows = Bpe.tokenStats(docs, "doc_id", "text", merges32k.take(k))
        .count()
      println(f"PROFILE bpe-segment k=$k docs=$rows wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
