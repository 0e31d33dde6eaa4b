package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SortedArrayJaccardSpec extends SparkSpec {
  import spark.implicits._

  test("matches the array_intersect formulation on random token sets") {
    val rng = new scala.util.Random(7)
    // non-empty sets: the built-in reference formulation raises
    // DIVIDE_BY_ZERO under ANSI for empty∩empty (the native expression
    // returns NaN instead — covered by the next test)
    val rows = (1 to 300).map { i =>
      val a = (0 to rng.nextInt(40)).map(_ => s"w${rng.nextInt(50)}").distinct
      val b = (0 to rng.nextInt(40)).map(_ => s"w${rng.nextInt(50)}").distinct
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .select($"id", array_sort($"a").as("a"), array_sort($"b").as("b"))
    val got = df.select($"id",
        SortedArrayJaccard($"a", $"b").as("fast"),
        jaccard($"a", $"b").as("reference"))
      .collect()
    got.foreach { r =>
      val (fast, ref) = (r.getDouble(1), r.getDouble(2))
      assert(fast == ref || (fast.isNaN && ref.isNaN),
        s"id=${r.getInt(0)}: $fast != $ref")
    }
  }

  test("null array yields null; empty arrays yield NaN") {
    val df = Seq(
      (1, Some(Seq("a", "b")), None: Option[Seq[String]]),
      (2, Some(Seq.empty[String]), Some(Seq.empty[String])),
      (3, Some(Seq("a")), Some(Seq("a")))).toDF("id", "a", "b")
    val out = df.select($"id", SortedArrayJaccard($"a", $"b").as("j"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1) == null)
    assert(out(2).asInstanceOf[Double].isNaN)
    assert(out(3) == 1.0)
  }

  test("rejects non-string-array inputs at analysis") {
    val df = Seq((1, Seq(1, 2), Seq("a"))).toDF("id", "a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(SortedArrayJaccard($"a", $"b")).collect()
    }
  }
}
