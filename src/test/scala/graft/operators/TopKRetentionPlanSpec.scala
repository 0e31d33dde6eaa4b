package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape contracts for the partial top-k and retention operators —
  * the 100 TB claims are structural: WHAT shuffles and WHAT sorts, not
  * small-scale timings. */
class TopKRetentionPlanSpec extends SparkSpec {
  import spark.implicits._

  test("topK plans as a hash aggregation with a partial stage — no window, no sort") {
    val df = spark.range(0, 1000, 1, 8)
      .select(($"id" % 10).as("g"), ($"id" % 97).cast("double").as("p"),
        $"id".as("t1"), lit(1L).as("t2"))
    val top = TopK.topK(3)
    val out = df.groupBy($"g").agg(top($"p", $"t1", $"t2").as("t"))
    val s = out.queryExecution.executedPlan.toString
    // the aggregation formulation: ObjectHashAggregate twice (partial +
    // final) around ONE exchange; a window formulation would show
    // Window + Sort and exchange every row
    assert(s.contains("ObjectHashAggregate"), s)
    assert(!s.contains("Window"), s)
    assert(!s.toLowerCase.contains("sortaggregate"), s)
    // AQE wraps the tree, so assert on the rendered plan: exactly one
    // exchange, with the PARTIAL top-k (the map-side k-cap) below it
    assert("Exchange hashpartitioning".r.findAllIn(s).size == 1,
      s"exactly one exchange expected:\n$s")
    assert(s.contains("partial_topkagg"), s"map-side partial expected:\n$s")
  }

  test("retention plans three hash aggregations and no count-distinct expand") {
    val ev = spark.range(0, 2000, 1, 8)
      .select(($"id" % 50).as("user_id"),
        timestamp_seconds(lit(1700000000L) + ($"id" % 40) * 86400L).as("ts"))
    val out = Retention.weeklyCohorts(ev, "user_id", "ts")
    val s = out.queryExecution.executedPlan.toString
    // distinct-then-count everywhere: no Expand (count-distinct rewrite),
    // no Window, no SortAggregate
    assert(!s.contains("Expand"), s)
    assert(!s.contains("Window"), s)
    assert(s.contains("HashAggregate"), s)
  }
}
