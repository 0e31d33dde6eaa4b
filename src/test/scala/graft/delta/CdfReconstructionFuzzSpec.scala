package graft.delta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Change-feed integrity under random DML: the SIGNED fold of the CDF
  * (insert/update_postimage = +1, delete/update_preimage = -1, per full
  * row value) must reconstruct the final table exactly — the invariant
  * incremental aggregate maintenance rests on. OPTIMIZE rewrites are
  * dataChange=false and must contribute NOTHING; RESTORE emits
  * compensating images; DV shading deletes emit the same images as
  * rewriting deletes. Fixed seed. */
class CdfReconstructionFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("CDF signed fold reconstructs the final state under random DML " +
      "(seeded)") {
    val rnd = new scala.util.Random(31415926L)
    withTempDir { dir =>
      var nextId = 0L
      def freshRows(n: Int): Seq[(Long, Long)] = {
        val r = (nextId until nextId + n).map(i => (i, i * 7))
        nextId += n
        r
      }
      DeltaTable.write(
        freshRows(50).toDF("id", "v").repartitionByRange(3, $"id"), dir,
        configuration = Map(
          "delta.enableChangeDataFeed" -> "true",
          "delta.enableDeletionVectors" -> "true"))
      for (step <- 1 to 22) {
        rnd.nextInt(10) match {
          case n if n <= 3 =>
            DeltaTable.write(freshRows(rnd.nextInt(8) + 1).toDF("id", "v")
              .coalesce(1), dir)
          case 4 | 5 => // shading delete
            val lo = rnd.nextLong().abs % math.max(nextId, 1L)
            DeltaTable.forPath(spark, dir)
              .delete($"id" >= lo && $"id" < lo + rnd.nextInt(12) + 1)
          case 6 | 7 => // update (pre+post images)
            val k = rnd.nextLong().abs % math.max(nextId, 1L)
            DeltaTable.forPath(spark, dir)
              .update($"id" === k, Map("v" -> (col("v") + lit(1000L))))
          case 8 => // dataChange=false rewrite: must be CDF-silent
            DeltaTable.forPath(spark, dir).compact()
          case _ =>
            val v = DeltaLog.forTable(spark, dir).update().version
            if (v >= 2) DeltaTable.forPath(spark, dir).restore(v - 2)
        }
      }
      val head = DeltaLog.forTable(spark, dir).update().version
      val folded = DeltaTable.forPath(spark, dir).changes(0, head)
        .groupBy($"id", $"v")
        .agg(sum(when(col("_change_type")
            .isin("insert", "update_postimage"), 1L)
          .when(col("_change_type")
            .isin("delete", "update_preimage"), -1L)
          .otherwise(lit(0L))).as("n"))
        .filter($"n" =!= 0L)
      val fromCdf = folded.select($"id", $"v", $"n")
        .as[(Long, Long, Long)].collect().toSet
      val actual = DeltaTable.forPath(spark, dir).toDF
        .groupBy($"id", $"v").agg(count(lit(1)).as("n"))
        .select($"id", $"v", $"n")
        .as[(Long, Long, Long)].collect().toSet
      assert(fromCdf == actual,
        s"CDF fold != table; onlyCdf=${(fromCdf -- actual).take(5)} " +
          s"onlyTable=${(actual -- fromCdf).take(5)}")
      assert(actual.nonEmpty)
    }
  }
}
