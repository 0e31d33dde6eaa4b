package graft.operators

import graft.SparkSpec

/** Cross-set ExactSubstr decontamination and the hashed linear scorer. */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("contamination marks exactly the verbatim-overlap windows") {
    // minLen 4; corpus doc 1 embeds the benchmark's "q1 q2 q3 q4" run
    val corpus = Seq(
      (1L, "a b q1 q2 q3 q4 c d"),      // windows at 2 hit (and only it)
      (2L, "clean text with no overlap at all"),
      (3L, "tiny"),
      (4L, "q1 q2 q3 q4 q5")            // benchmark run + extension
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "x y q1 q2 q3 q4 q5 z")
    ).toDF("bid", "btext")
    val out = Dedup.exactSubstrContamination(
        corpus, "doc_id", "text", bench, "bid", "btext", minLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size == 4)
    assert(out(1L) == ((5L, 1L, 0.2))) // only window "q1 q2 q3 q4"
    assert(out(2L) == ((4L, 0L, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0)))
    assert(out(4L) == ((2L, 2L, 1.0))) // both windows verbatim in bench
  }

  test("hashed linear scorer: deterministic, empty docs score zero") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"), // identical text -> identical score
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Curation.hashedLinearScore(docs, "doc_id", "text",
        dim = 16, salt = "s")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out(1L) == out(2L))
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2) <= 1.0)
    assert(out(3L) == ((0L, 0.0)))
  }

  test("BPE vocab artifact: segmentation from the stored table matches") {
    withTempDir { dir =>
      val docs = Seq((1L, "low low low"), (2L, "lower lowest"))
        .toDF("doc_id", "text")
      Bpe.buildBpeVocab(docs, "text", 3, dir)
      val fromArtifact = Bpe.tokenStatsFromVocab(spark, dir, docs,
        "doc_id", "text").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val direct = Bpe.tokenStats(docs, "doc_id", "text",
        Seq(("l", "o"), ("lo", "w"), ("low", "e"))).collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fromArtifact == direct)
    }
  }
}
