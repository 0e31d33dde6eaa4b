package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-level global running sum: agreement with the single-partition
  * window (the semantic oracle), negatives, tie-breaks, empty input,
  * and partitioning invariance. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("matches the global window on random signed data with duplicate keys") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map(i =>
      (rnd.nextInt(100).toLong, i.toLong, rnd.nextInt(21).toLong - 10))
    val df = rows.toDF("k", "tie", "v").repartition(8)
    val got = PrefixSum.runningTotal(df, $"k" / 7L,
        Seq($"k".asc, $"tie".asc), $"v", "run")
      .select($"k", $"tie", $"run").as[(Long, Long, Long)].collect().toSet
    val w = Window.orderBy($"k".asc, $"tie".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("run", sum($"v").over(w))
      .select($"k", $"tie", $"run").as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("partitioning-invariant and empty-safe") {
    val df = Seq((5L, 1L), (12L, 2L), (25L, 3L)).toDF("k", "v")
    def run(parts: Int) = PrefixSum.runningTotal(df.repartition(parts),
        $"k" / 10L, Seq($"k".asc), $"v", "run")
      .select($"k", $"run").as[(Long, Long)].collect().toSet
    assert(run(1) == run(7))
    assert(run(2) == Set((5L, 1L), (12L, 3L), (25L, 6L)))
    val empty = PrefixSum.runningTotal(
      df.filter($"k" < 0L), $"k", Seq($"k".asc), $"v", "run")
    assert(empty.count() == 0L)
  }
}
