package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property fuzzing of ExactSubstr against a brute-force oracle: on
  * random small-alphabet corpora (where duplicated windows are dense
  * and spans merge in every configuration), the relational pipeline's
  * spans must equal the set computed by direct enumeration — every
  * window counted with plain Maps, coverage unioned positionally, runs
  * extracted by scanning — with none of the operator's machinery. */
class ExactSubstrFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 14)
    toks <- Gen.listOfN(n, Gen.oneOf("x", "y", "z"))
  } yield toks.mkString(" ")

  private val genCorpus: Gen[List[String]] =
    Gen.choose(1, 5).flatMap(k => Gen.listOfN(k, genDoc))

  /** Brute-force spans: mark window starts whose window string occurs
    * >= minCount times corpus-wide, take each doc's covered position
    * set, and emit its maximal runs. */
  private def bruteSpans(docs: Seq[(Long, String)], minLen: Int,
                         minCount: Int): Set[(Long, Int, Int)] = {
    def toks(s: String) =
      if (s.trim.isEmpty) Array.empty[String] else s.trim.split("\\s+")
    val counts = scala.collection.mutable.Map.empty[String, Int]
    docs.foreach { case (_, text) =>
      val tk = toks(text)
      (0 to tk.length - minLen).foreach { p =>
        val w = tk.slice(p, p + minLen).mkString(" ")
        counts(w) = counts.getOrElse(w, 0) + 1
      }
    }
    docs.flatMap { case (id, text) =>
      val tk = toks(text)
      val covered = (0 to tk.length - minLen)
        .filter { p =>
          counts(tk.slice(p, p + minLen).mkString(" ")) >= minCount }
        .flatMap(p => p until p + minLen).toSet
      // maximal runs of covered positions
      val runs = scala.collection.mutable.ListBuffer.empty[(Long, Int, Int)]
      var p = 0
      while (p < tk.length) {
        if (covered(p)) {
          val start = p
          while (p < tk.length && covered(p)) p += 1
          runs += ((id, start, p - 1))
        } else p += 1
      }
      runs
    }.toSet
  }

  test("random corpora: relational spans equal brute force (fixed seed)") {
    val prop = Prop.forAll(genCorpus, Gen.oneOf(2, 3)) { (corpus, minCount) =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.exactSubstrSpans(df, "doc_id", "text",
          minLen = 3, minCount = minCount)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      val want = bruteSpans(docs, minLen = 3, minCount = minCount)
      if (got != want) {
        println(s"corpus=$docs minCount=$minCount got=$got want=$want")
      }
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(60)
        .withInitialSeed(org.scalacheck.rng.Seed(7L)),
      prop)
    assert(result.passed, s"scalacheck: ${result.status}")
  }
}
