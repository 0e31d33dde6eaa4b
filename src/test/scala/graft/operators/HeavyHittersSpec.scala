package graft.operators

import graft.SparkSpec

/** [[HeavyHitters.frequentTokens]] — exact heavy hitters through the
  * Misra–Gries sketch + verify passes. The load-bearing claims:
  *  1. output equals the brute-force exact answer (the sketch can never
  *     cost recall) — fuzzed over seeded Zipf-ish corpora;
  *  2. the answer is invariant under repartitioning (per-partition
  *     sketch contents differ wildly; exact verification erases that);
  *  3. the sketch primitives hold their bounds: a partition summary
  *     never exceeds capacity, merges never exceed capacity, and
  *     undercounts stay within n/(c+1).
  */
class HeavyHittersSpec extends SparkSpec {

  private def bruteForce(docs: Seq[String], k: Int): Set[(String, Long, Long)] = {
    val toks = docs.flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
    val n = toks.size.toLong
    toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }
      .map { case (t, c) => (t, c, n) }.toSet
  }

  private def run(docs: Seq[String], k: Int, parts: Int)
      : Set[(String, Long, Long)] = {
    import spark.implicits._
    val df = docs.toDF("text").repartition(parts)
    HeavyHitters.frequentTokens(df, "text", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("zipf-ish fuzz matches brute force across k and partitionings") {
    val rnd = new scala.util.Random(8153L)
    for (trial <- 1 to 6) {
      // skewed vocabulary: token i drawn with weight ~ 1/(i+1)
      val vocab = (0 until 40).map(i => s"w$i")
      val weights = vocab.indices.map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      def draw(): String = {
        val x = rnd.nextDouble() * total
        vocab(cum.indexWhere(x <= _))
      }
      val docs = Seq.fill(30 + rnd.nextInt(40))(
        Seq.fill(5 + rnd.nextInt(30))(draw()).mkString(" "))
      for (k <- Seq(5, 11, 25); parts <- Seq(1, 3, 7)) {
        val got = run(docs, k, parts)
        val want = bruteForce(docs, k)
        assert(got == want, s"trial=$trial k=$k parts=$parts")
      }
    }
  }

  test("uniform corpus with no qualifying token returns empty") {
    // 200 distinct tokens, one occurrence each: threshold n/k = 4 > 1
    val docs = (0 until 100).map(i => s"t${i * 2} t${i * 2 + 1}")
    assert(run(docs, 50, 4).isEmpty)
  }

  test("partition summary and merges respect capacity and error bound") {
    val rnd = new scala.util.Random(42L)
    val items = Seq.fill(5000)(s"x${rnd.nextInt(300)}")
    val c = 20
    val s1 = HeavyHitters.partitionSummary(items.iterator, c)
    assert(s1.size <= c)
    // MG undercount bound: est >= true - n/(c+1)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val slack = items.size.toLong / (c + 1)
    s1.foreach { case (t, est) =>
      assert(est <= exact(t) && est >= exact(t) - slack, t)
    }
    val (h1, h2) = items.splitAt(items.size / 2)
    val m = HeavyHitters.mergeSummaries(
      HeavyHitters.partitionSummary(h1.iterator, c),
      HeavyHitters.partitionSummary(h2.iterator, c), c)
    assert(m.size <= c)
    m.foreach { case (t, est) =>
      assert(est <= exact(t) && est >= exact(t) - slack, s"merged $t")
    }
  }

  test("whitespace-only and empty docs contribute nothing") {
    val docs = Seq("a a a b", "", "   ", "a b")
    assert(run(docs, 3, 2) == Set(("a", 4L, 6L)))
  }
}
