package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer fixed-point PageRank: hand-computed supersteps on a path
  * graph, and bit-identical results under different partitionings (the
  * property that makes the iterative operator oracle-able). */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("two supersteps on a 3-node path match hand arithmetic") {
    // undirected path 1-2-3, scale 1000, d = 85/100:
    //   r1 = (575, 1850, 575); r2 = (936, 1127, 936) — all integer `div`
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val r = PageRank.ranks(edges, iterations = 2, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 936L, 2L -> 1127L, 3L -> 936L), r.toString)
  }

  test("topRanks (managed iteration) equals lazy ranks, state unpersisted") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val lazyTop = PageRank.ranks(edges, 2, scale = 1000L)
      .orderBy($"r".desc, $"id".asc).as[(Long, Long)].collect().toList
    // the managed form must leave nothing cached behind that it added
    // (the session is shared across suites — compare against a baseline)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val managed = PageRank.topRanks(edges, 2, k = 3, scale = 1000L)
      .as[(Long, Long)].collect().toList
    assert(managed == lazyTop, s"$managed vs $lazyTop")
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty, s"topRanks leaked cached RDDs: $added")
  }

  test("ranks are partitioning-invariant (exact integers, no float order)") {
    val base = spark.range(0, 500)
      .select(($"id" % 37).as("src"), (($"id" * 7 + 3) % 37).as("dst"))
      .filter($"src" =!= $"dst")
    val und = base.union(base.select($"dst".as("src"), $"src".as("dst")))
    val a = PageRank.ranks(und.repartition(2), 3).as[(Long, Long)].collect().toSet
    val b = PageRank.ranks(und.repartition(17), 3).as[(Long, Long)].collect().toSet
    assert(a == b)
    // teleport floor: every node keeps at least the base mass
    assert(a.forall(_._2 >= 150000000L), a.toString)
  }
}
