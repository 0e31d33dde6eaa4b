package graft.operators

import graft.SparkSpec

/** BPE merge training: the classic low/lower/lowest worked example, the
  * greedy-left replace semantics, and segmentation with trained merges. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge order and counts on the classic example") {
    val docs = Seq(
      (1L, "low low low"),
      (2L, "lower lowest")
    ).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // pair counts: (l,o)=5 ties (o,w)=5 -> lexicographic tie-break picks
    // (l,o); then (lo,w)=5; then (low,e)=2
    assert(merges == Seq(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "w", "low", 5L),
      (3, "low", "e", "lowe", 2L)))
  }

  test("greedy left-to-right: overlapping pairs merge like the reference") {
    // "aaaa" with merge (a,a): greedy non-overlapping -> [aa][aa], so the
    // second-round pair stats must see (aa,aa), never (a,aa)
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges.toSeq == Seq(("a", "a", 6L), ("aa", "aa", 2L)))
  }

  test("early stop when the vocabulary is fully merged") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", 5).collect()
    assert(merges.length == 1) // (a,b) then nothing left to merge
  }

  test("driver fast path and distributed fallback train identical merges") {
    // ties, repeated pairs, self-pairs, shared prefixes/suffixes — the
    // cases where a heap/tie-break bug would diverge from the per-round
    // distributed argmax
    val docs = Seq(
      (1L, "the theme thesis there other ether"),
      (2L, "banana bandana ananas banal anneal"),
      (3L, "aaaa aaa aa a abab ababab"),
      (4L, "low lower lowest slow slowest glow"),
      (5L, "mississippi missive permission emission")
    ).toDF("doc_id", "text")
    def run(k: Int): Seq[(Int, String, String, Long)] =
      Bpe.trainMerges(docs, "text", k).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(4))).toSeq
    val local = run(15)
    assert(local.size == 15)
    spark.conf.set(Bpe.MaxDictWordsKey, "1") // force the distributed path
    try {
      val dist = run(15)
      assert(local == dist,
        s"paths diverged:\n  local: $local\n  dist:  $dist")
    } finally spark.conf.unset(Bpe.MaxDictWordsKey)
  }

  test("native segmentation equals the replace-chain on trained vocabularies") {
    val docs = Seq(
      (1L, "the theme thesis there other ether banana bandana ananas"),
      (2L, "aaaa aaa aa a abab ababab low lower lowest slow slowest"),
      (3L, "mississippi missive permission emission glow low low"),
      (4L, ""),
      (5L, "??? !!!")
    ).toDF("doc_id", "text")
    Seq(1, 5, 15, 40).foreach { k =>
      val merges = Bpe.trainMerges(docs, "text", k)
        .collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val fast = Bpe.tokenStats(docs, "doc_id", "text", merges)
        .collect().map(_.toSeq).toSet
      val chain = Bpe.tokenStatsChained(docs, "doc_id", "text", merges)
        .collect().map(_.toSeq).toSet
      assert(fast == chain,
        s"k=$k diverged:\n  fast:  $fast\n  chain: $chain")
    }
  }

  test("malformed merge lists are rejected, not silently mis-segmented") {
    val docs = Seq((1L, "abc abc")).toDF("doc_id", "text")
    // ("ab", "c") references symbol "ab" that no earlier merge produced:
    // sequential and lowest-rank-first application could diverge
    val e = intercept[IllegalArgumentException] {
      Bpe.tokenStats(docs, "doc_id", "text", Seq(("ab", "c"))).collect()
    }
    assert(e.getMessage.contains("rank 1"))
    // the same pair is fine once rank 1 produces "ab"
    val ok = Bpe.tokenStats(docs, "doc_id", "text",
        Seq(("a", "b"), ("ab", "c")))
      .select($"n_tokens").as[Long].collect()
    assert(ok.toSeq == Seq(2L)) // two words, each one "abc" token...
  }

  test("segmentation counts tokens under the trained merges") {
    val docs = Seq(
      (1L, "low low low"),
      (2L, "lower lowest"),
      (3L, ""),
      (4L, "???")
    ).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "e"))
    val out = Bpe.tokenStats(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // low -> [low] (1 token); lower -> [lowe][r] (2); lowest -> [lowe][s][t] (3)
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((2L, 5L, 2.5)))
    assert(out(3L) == ((0L, 0L, 0.0)))   // empty doc stays in the output
    assert(out(4L) == ((0L, 0L, 0.0)))   // no alnum words
  }
}
