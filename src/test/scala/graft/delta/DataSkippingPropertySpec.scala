package graft.delta

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property test for the conservative-skipping invariant: for ANY data
  * distribution and ANY supported predicate, a filtered read over a
  * skipping-enabled table returns exactly the rows the predicate selects
  * — file-level skipping may only drop files that contain no match.
  * (SURVEY §5: the reference has no property tests; scalacheck is our
  * addition.) */
class DataSkippingPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)

  private def randomRows(n: Int): Seq[(Long, Double, String, java.sql.Timestamp)] =
    (1 to n).map { i =>
      val id = rng.nextInt(1000).toLong
      val score = rng.nextInt(2000) / 10.0
      val name = s"${('a' + rng.nextInt(26)).toChar}${rng.nextInt(100)}"
      val ts = new java.sql.Timestamp(1600000000000L + rng.nextInt(100000) * 10000L)
      (id, score, name, ts)
    }

  private def randomPredicates: Seq[Column] = {
    val idCut = rng.nextInt(1000).toLong
    val scoreCut = rng.nextInt(2000) / 10.0
    val prefix = s"${('a' + rng.nextInt(26)).toChar}"
    Seq(
      $"id" === idCut,
      $"id" > idCut,
      $"id" <= idCut,
      $"score" >= scoreCut,
      $"score" < scoreCut && $"id" > idCut,
      $"name".startsWith(prefix),
      $"name" >= prefix,
      $"id".isin(idCut, idCut + 3, idCut + 7),
      $"ts" > new java.sql.Timestamp(1600000000000L + rng.nextInt(100000) * 10000L),
      $"id" > idCut || $"score" < scoreCut)
  }

  test("skipping-enabled reads equal in-memory filtering for random data") {
    withTempDir { dir =>
      val rows = randomRows(2000)
      // multiple files with overlapping AND disjoint ranges: half range-
      // partitioned (tight min/max), half hash-partitioned (wide min/max)
      val df = rows.toDF("id", "score", "name", "ts")
      DeltaTable.write(df.limit(1000).repartitionByRange(6, $"id"), dir)
      DeltaTable.write(df.except(df.limit(1000)).repartition(4), dir)
      val table = DeltaTable.forPath(spark, dir)
      assert(DeltaLog.forTable(spark, dir).update().allFiles.size >= 8)

      val expected = table.toDF.collect().map(_.toSeq).toSet // ground truth once
      (1 to 3).foreach { _ =>
        randomPredicates.foreach { pred =>
          val got = table.toDF.filter(pred).collect().map(_.toSeq).toSet
          val reference = spark.createDataFrame(
            spark.sparkContext.parallelize(
              expected.toSeq.map(org.apache.spark.sql.Row.fromSeq)),
            table.toDF.schema).filter(pred).collect().map(_.toSeq).toSet
          assert(got == reference, s"mismatch for predicate $pred")
        }
      }
    }
  }
}
