package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partial top-k aggregation: rank order (key desc, ties asc), the k cap
  * under partial/merge paths, groups smaller than k, and agreement with
  * the window formulation on skewed multi-partition input. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("rank order, tie-breaks, and short groups") {
    val df = Seq(
      (1L, 5.0, 10L, 1L), (1L, 7.0, 11L, 1L), (1L, 7.0, 9L, 2L),
      (1L, 7.0, 9L, 1L), (1L, 1.0, 2L, 1L),
      (2L, 3.0, 1L, 1L)
    ).toDF("g", "price", "ok", "ln")
    val top3 = TopK.topK(3)
    val r = df.groupBy($"g").agg(top3($"price", $"ok", $"ln").as("t"))
      .select($"g", posexplode($"t"))
      .select($"g", $"pos", $"col._1", $"col._2", $"col._3")
      .as[(Long, Int, Double, Long, Long)].collect().toSet
    assert(r == Set(
      // g=1: three 7.0s win; ties order by (ok, ln) asc; the 5.0 and 1.0 fall out
      (1L, 0, 7.0, 9L, 1L), (1L, 1, 7.0, 9L, 2L), (1L, 2, 7.0, 11L, 1L),
      // g=2: group smaller than k keeps its single row
      (2L, 0, 3.0, 1L, 1L)), r.toString)
  }

  test("agrees with the window formulation on skewed 32-partition input") {
    // one hot group with 5k rows across all partitions + many singletons
    val df = spark.range(0, 6000, 1, 32)
      .select(
        when($"id" < 5000, lit(0L)).otherwise($"id").as("g"),
        ($"id" % 97).cast("double").as("price"),
        $"id".as("ok"), lit(1L).as("ln"))
    val topk = TopK.topK(4)
    val agg = df.groupBy($"g").agg(topk($"price", $"ok", $"ln").as("t"))
      .select($"g", posexplode($"t"))
      .select($"g", ($"pos" + 1).cast("long").as("rnk"),
        $"col._1".as("price"), $"col._2".as("ok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"price".desc, $"ok".asc)
    val win = df.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 4)
      .select($"g", $"rnk".cast("long"), $"price", $"ok")
    assert(agg.count() == win.count())
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)
  }
}
