package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

class LshSignBucketSpec extends SparkSpec {
  import spark.implicits._

  /** The interpreted higher-order formulation the native expression
    * replaced — kept here as the reference semantics. */
  private def referenceBucket(vecCol: Column, dim: Int, planes: Int): Column = {
    def planeCoef(j: Int, i: Column): Column =
      (i * 31 + lit(j * 17 + 7)) % 7 - 3
    (0 until planes).map { j =>
      val dot = aggregate(
        zip_with(vecCol, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") * planeCoef(j, i).cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("bit-identical to the interpreted formulation on random float vectors") {
    val rng = new scala.util.Random(7)
    val dim = 32
    val rows = (1 to 300).map(i => (i, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "v")
    Seq(1, 4, 8, 13).foreach { planes =>
      val out = df.select($"id",
        LshSignBucket($"v", dim, planes).as("fast"),
        referenceBucket($"v", dim, planes).as("reference")).collect()
      out.foreach { r =>
        assert(r.getLong(1) == r.getLong(2), s"id=${r.getInt(0)} planes=$planes")
      }
    }
  }

  test("double vectors and boundary zero dots match the reference") {
    val dim = 8
    val df = Seq(
      (1, Seq.fill(dim)(0.0)), // all dots exactly 0 -> every bit set
      (2, (1 to dim).map(_.toDouble)),
      (3, (1 to dim).map(i => -i.toDouble))).toDF("id", "v")
    val out = df.select($"id",
      LshSignBucket($"v", dim, 6).as("fast"),
      referenceBucket($"v", dim, 6).as("reference")).collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getInt(0)}"))
    assert(out.find(_.getInt(0) == 1).get.getLong(1) == 63L)
  }

  test("null vector, wrong length and null element yield bucket 0 (not null)") {
    val df = Seq(
      (1, None: Option[Seq[Double]]),
      (2, Some(Seq(1.0, 2.0))), // length 2 != dim 4
      (3, Some(Seq(1.0, 2.0, 3.0, 4.0)))).toDF("id", "v")
    val out = df.select($"id", LshSignBucket($"v", 4, 3).as("b"),
        referenceBucket($"v", 4, 3).as("ref")).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1)._1 == 0L && out(1)._1 == out(1)._2)
    assert(out(2)._1 == 0L && out(2)._1 == out(2)._2)
    assert(out(3)._1 == out(3)._2)
    val nullElem = Seq((4, Seq(Some(1.0), None, Some(3.0), Some(4.0))))
      .toDF("id", "v").select(LshSignBucket($"v", 4, 3).as("b")).collect()
    assert(!nullElem.head.isNullAt(0) && nullElem.head.getLong(0) == 0L)
  }

  test("rejects non-numeric-array inputs at analysis") {
    val df = Seq((1, Seq("x"))).toDF("id", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(LshSignBucket($"v", 1, 1)).collect()
    }
  }
}
