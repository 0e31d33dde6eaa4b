package graft.operators

import graft.SparkSpec

/** Property fuzzing of the native BPE segmentation expression: on random
  * small-alphabet corpora (dense pair collisions, self-repeats, ties),
  * vocabularies TRAINED at varying k must segment identically through
  * the one-expression greedy-lowest-rank path and the k-projection
  * replace-chain — the greedy ≡ sequential equivalence the expression's
  * scaladoc argues for well-formed merge lists, machine-checked. */
class BpeSegmentFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def randomDoc(rnd: scala.util.Random): String = {
    val n = rnd.nextInt(12)
    Seq.fill(n) {
      val len = 1 + rnd.nextInt(6)
      Seq.fill(len)(Seq("a", "b", "c")(rnd.nextInt(3))).mkString
    }.mkString(" ")
  }

  test("random corpora: expression segmentation equals the replace-chain (fixed seed)") {
    val rnd = new scala.util.Random(29L)
    (1 to 20).foreach { trial =>
      val docs = (0 until (1 + rnd.nextInt(4)))
        .map(i => (i.toLong, randomDoc(rnd)))
        .toDF("doc_id", "text")
      val k = 1 + rnd.nextInt(30)
      val merges = Bpe.trainMerges(docs, "text", k)
        .collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val fast = Bpe.tokenStats(docs, "doc_id", "text", merges)
        .collect().map(_.toSeq).toSet
      val chain = Bpe.tokenStatsChained(docs, "doc_id", "text", merges)
        .collect().map(_.toSeq).toSet
      assert(fast == chain,
        s"trial $trial (k=$k, merges=$merges) diverged:\n" +
          s"  fast:  $fast\n  chain: $chain")
    }
  }
}
