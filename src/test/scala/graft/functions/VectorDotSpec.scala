package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the higher-order dot product on float vectors") {
    val rng = new scala.util.Random(3)
    val rows = (1 to 200).map { i =>
      (i, Seq.fill(64)(rng.nextFloat() * 2 - 1), Seq.fill(64)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select($"id",
      VectorDot($"a", $"b").as("fast"),
      dotProduct($"a", $"b").as("reference")).collect()
    out.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"id=${r.getInt(0)}")
    }
  }

  test("null array, length mismatch and null element all yield null") {
    val df = Seq(
      (1, Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (2, Some(Seq(1.0, 2.0)), Some(Seq(1.0))),
      (3, Some(Seq(1.0, 2.0)), Some(Seq(1.0, 3.0)))).toDF("id", "a", "b")
    val out = df.select($"id", VectorDot($"a", $"b").as("d")).collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1) == null)
    assert(out(2) == null)
    assert(out(3) == 7.0)
    val withNullElem = Seq((4, Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("id", "a", "b")
      .select(VectorDot($"a", $"b").as("d")).collect()
    assert(withNullElem.head.isNullAt(0))
  }

  test("rejects non-numeric-array inputs at analysis") {
    val df = Seq((1, Seq("x"), Seq(1.0))).toDF("id", "a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorDot($"a", $"b")).collect()
    }
  }
}
