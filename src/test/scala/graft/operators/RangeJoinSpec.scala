package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Binned point-in-interval join: exact BETWEEN semantics, equi-join
  * plan shape (never a nested loop), loud degenerate-interval guard. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 64L), (4L, 65L), (5L, 1000L)
  ).toDF("pid", "v")
  private val intervals = Seq(
    (10L, 0L, 10L),     // catches 5 and 10 (inclusive ends)
    (20L, 8L, 70L),     // spans bins: catches 10, 64, 65
    (30L, 200L, 210L)   // catches nothing
  ).toDF("iid", "s", "e")

  test("exact BETWEEN semantics across bin boundaries") {
    val out = RangeJoin.pointInInterval(points, "v", intervals, "s", "e",
        binWidth = 32)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L),
      (4L, 20L)))
  }

  test("plans as an equi-join, never a nested loop or cartesian") {
    val joined = RangeJoin.pointInInterval(points, "v", intervals,
      "s", "e", binWidth = 32)
    joined.collect() // finalize AQE
    def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      // AQE stage leaves hide their subtree behind `plan`
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: leaves(q.plan)
      case other =>
        other +: (other.children.flatMap(leaves) ++
          other.subqueries.flatMap(leaves))
    }
    val nodes = leaves(joined.queryExecution.executedPlan)
    assert(!nodes.exists(n => n.isInstanceOf[BroadcastNestedLoopJoinExec] ||
      n.isInstanceOf[CartesianProductExec]),
      nodes.map(_.nodeName).mkString(", "))
    assert(nodes.exists(_.nodeName.toLowerCase.contains("join")),
      "no join node found")
  }

  test("degenerate giant interval fails loudly, not silently explodes") {
    val bad = Seq((1L, 0L, 10000000L)).toDF("iid", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "v", bad, "s", "e",
        binWidth = 2, maxBinsPerInterval = 100).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("bins of width") ||
        Option(e.getCause).exists(_.getMessage.contains("bins of width"))))
  }

  test("interval overlap: exact pairs, no duplicates from shared bins") {
    val left = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 200L, 210L))
      .toDF("lid", "ls", "le")
    val right = Seq((10L, 90L, 300L), (20L, 55L, 58L), (30L, 400L, 410L))
      .toDF("rid", "rs", "re")
    // (1,10): overlap [90,100] spans MANY shared bins at width 8 — the
    // canonical-bin guard must emit the pair exactly once
    val out = RangeJoin.intervalOverlap(left, "ls", "le",
        right, "rs", "re", binWidth = 8)
      .select($"lid", $"rid").as[(Long, Long)].collect().toList
    assert(out.sorted == List((1L, 10L), (1L, 20L), (2L, 20L), (3L, 10L)))
    assert(out.distinct.size == out.size, s"duplicate pairs: $out")
  }

  test("shared column names fail up front with a clear message") {
    val l = Seq((1L, 0L, 10L)).toDF("id", "start", "end")
    val r = Seq((2L, 5L, 15L)).toDF("id", "start", "end")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, "start", "end", r, "start", "end", 8)
    }
    assert(e.getMessage.contains("rename"))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(
        Seq((1L, 3L)).toDF("id", "v"), "v", r, "start", "end", 8)
    }
    assert(e2.getMessage.contains("id"))
  }

  test("negative values bin correctly (floor, not truncate)") {
    val p = Seq((1L, -5L), (2L, -64L)).toDF("pid", "v")
    val i = Seq((9L, -70L, -1L)).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(p, "v", i, "s", "e", binWidth = 32)
      .select($"pid").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }
}
