package graft.operators

import graft.SparkSpec

/** [[Dedup.ngramContainment]] — directed word-n-gram containment pairs,
  * machine-checked against a brute-force all-pairs oracle on a seeded
  * random corpus (the prefix blocker must be EXACT: 100% recall), plus
  * the motivating asymmetric case: a short doc embedded verbatim in a
  * long one scores containment ≈ 1 while its Jaccard is far below any
  * useful threshold. */
class ContainmentSpec extends SparkSpec {

  private val n = 3
  private val t = 0.8

  /** Brute-force oracle: exact containment over all ordered pairs. */
  private def oracle(corpus: Seq[(Long, String)])
      : Set[(Long, Long, Int, Int)] = {
    def grams(s: String): Set[String] = {
      val tk = s.trim.split("\\s+").filter(_.nonEmpty)
      if (tk.length < n) Set.empty
      else tk.sliding(n).map(_.mkString(" ")).toSet
    }
    val g = corpus.map { case (id, s) => id -> grams(s) }
      .filter(_._2.nonEmpty)
    (for {
      (a, ga) <- g; (b, gb) <- g if a != b
      inter = (ga & gb).size
      if inter >= math.ceil(t * ga.size)
    } yield (a, b, inter, ga.size)).toSet
  }

  private def run(corpus: Seq[(Long, String)]): Set[(Long, Long, Int, Int)] = {
    import spark.implicits._
    Dedup.ngramContainment(corpus.toDF("doc_id", "text"), "doc_id", "text",
        n = n, threshold = t)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
  }

  test("embedded short doc: containment ~1 where jaccard fails") {
    val core = "the five boxing wizards jump quickly over the lazy dog"
    val long = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed " +
      "do eiusmod tempor incididunt ut labore ") + core +
      (" ut enim ad minim veniam quis nostrud exercitation ullamco laboris " +
        "nisi ut aliquip ex ea commodo consequat duis aute irure")
    val corpus = Seq(1L -> core, 2L -> long,
      3L -> "completely unrelated text about distributed query planning")
    val got = run(corpus)
    // direction matters: 1 is contained in 2, not vice versa
    assert(got.exists { case (a, b, _, _) => (a, b) == (1L, 2L) })
    assert(!got.exists { case (a, b, _, _) => (a, b) == (2L, 1L) })
    assert(got == oracle(corpus))
    // and jaccard at the same threshold misses the pair entirely
    import spark.implicits._
    val jac = Dedup.ngramJaccard(corpus.toDF("doc_id", "text"),
      "doc_id", "text", n = 3, threshold = t).collect()
    assert(!jac.exists(r => Set(r.getLong(0), r.getLong(1)) == Set(1L, 2L)))
  }

  test("seeded random corpus matches the brute-force oracle exactly") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def sentence(len: Int): String =
      Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // base docs plus embedded / truncated / mutated derivatives: dense
    // enough that qualifying pairs exist in both directions
    val base = (1L to 12L).map(i => i -> sentence(6 + rnd.nextInt(10)))
    val derived = base.take(6).zipWithIndex.map { case ((i, s), k) =>
      (100L + k) -> (if (k % 2 == 0) s"${sentence(3)} $s ${sentence(4)}"
                     else s.split(" ").drop(1).mkString(" "))
    }
    val corpus = base ++ derived
    assert(run(corpus) == oracle(corpus))
  }

  test("plans as equi-joins only: no nested loop, no cartesian") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import spark.implicits._
    val corpus = (1L to 20L).map(i =>
      i -> s"alpha beta gamma delta tok$i epsilon zeta tok${i % 5}")
    val out = Dedup.ngramContainment(corpus.toDF("doc_id", "text"),
      "doc_id", "text", n = n, threshold = t)
    out.collect() // finalize AQE
    def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case q: QueryStageExec => q +: leaves(q.plan)
      case other =>
        other +: (other.children.flatMap(leaves) ++
          other.subqueries.flatMap(leaves))
    }
    val nodes = leaves(out.queryExecution.executedPlan)
    assert(!nodes.exists(p => p.isInstanceOf[BroadcastNestedLoopJoinExec] ||
      p.isInstanceOf[CartesianProductExec]),
      nodes.map(_.nodeName).mkString(", "))
  }

  test("documents under n tokens never pair") {
    val corpus = Seq(1L -> "two words", 2L -> "two words",
      3L -> "three whole words", 4L -> "three whole words here")
    val got = run(corpus)
    assert(got.forall { case (a, b, _, _) => a >= 3L && b >= 3L })
  }
}
