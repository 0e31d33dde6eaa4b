package graft.operators

import graft.SparkSpec

/** The gram-dictionary guard of [[Dedup.ngramJaccard]]: under
  * `spark.graft.dedup.maxGramDict` the dictionary is a bounded driver
  * collect; over it, interning goes fully distributed (sorted
  * zipWithIndex ranking — the driver never materializes a gram). Both
  * strategies assign the SAME dense rarest-first ids (same (df, gram)
  * sort), so the output pairs are bit-identical. */
class NgramDictGuardSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonite"),
      (3L, "an entirely different document about query optimizers"),
      (4L, "an entirely different document about query optimizers"),
      (5L, "short unrelated noise"))
      .toDF("doc_id", "text")
  }

  private def pairs() =
    Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("past the bound, interning goes distributed with identical pairs") {
    val viaDriver = pairs()
    assert(Dedup.lastGramInterning == "driver")
    assert(viaDriver.exists { case (i, j, _) => (i, j) == (3L, 4L) })
    assert(viaDriver.exists { case (i, j, _) => (i, j) == (1L, 2L) })

    spark.conf.set("spark.graft.dedup.maxGramDict", "5")
    try {
      val viaDistributed = pairs()
      assert(Dedup.lastGramInterning == "distributed")
      assert(viaDistributed == viaDriver)
    } finally spark.conf.unset("spark.graft.dedup.maxGramDict")
  }
}
