package graft.operators

import graft.SparkSpec

/** [[CorpusStats.discreteQuantiles]] against hand-computed type-1
  * quantiles (the oracled query proves cross-engine equality; this pins
  * the ALGORITHM: rank = ceil(p*n), ties collapse, singleton groups). */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("rank selection, duplicate values, and singleton groups") {
    val df = Seq(
      // group a: sorted values 1,2,2,2,9,10 (n=6)
      ("a", 2L), ("a", 9L), ("a", 1L), ("a", 2L), ("a", 10L), ("a", 2L),
      // group b: a single value — every quantile IS that value
      ("b", 7L)
    ).toDF("g", "v")
    val out = CorpusStats.discreteQuantiles(df, "g", "v",
      Seq(0.5, 0.9, 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a: ceil(.5*6)=3 → 2; ceil(.9*6)=6 → 10; ceil(1*6)=6 → 10
    assert(out("a") == ((6L, 2L, 10L, 10L)), s"got ${out("a")}")
    assert(out("b") == ((1L, 7L, 7L, 7L)), s"got ${out("b")}")
  }

  test("p out of range is refused") {
    val df = Seq(("a", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      CorpusStats.discreteQuantiles(df, "g", "v", Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      CorpusStats.discreteQuantiles(df, "g", "v", Seq(1.5))
    }
  }
}
