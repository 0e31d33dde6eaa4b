package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BitsetJaccardSpec extends SparkSpec {
  import spark.implicits._

  test("bitset jaccard is bit-identical to the sorted-array merge walk") {
    val rng = new scala.util.Random(11)
    val universe = 700 // > one word, exercises multi-word AND/OR
    val words = (universe >> 6) + 1
    val rows = (1 to 300).map { i =>
      val a = (0 to rng.nextInt(60)).map(_ => 1 + rng.nextInt(universe)).distinct.sorted
      val b = (0 to rng.nextInt(60)).map(_ => 1 + rng.nextInt(universe)).distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id",
        BitsetJaccard(IntArrayBitset($"a", words), IntArrayBitset($"b", words))
          .as("bitset"),
        SortedArrayJaccard($"a", $"b").as("merge"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"id=${r.getInt(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("handles word-boundary ids, empty sets and unequal widths") {
    // ids on both sides of the 64-bit word boundary
    val df = Seq(
      (1, Seq(63, 64, 65), Seq(64, 65, 66)),
      (2, Seq.empty[Int], Seq.empty[Int]),
      (3, Seq(1), Seq(128))).toDF("id", "a", "b")
    val out = df.select($"id",
        BitsetJaccard(IntArrayBitset($"a", 3), IntArrayBitset($"b", 3)).as("j"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out(1) == 2.0 / 4.0)
    assert(out(2).isNaN) // popcount 0/0, same as the array form
    assert(out(3) == 0.0)

    // trailing words of a WIDER side count toward the union only
    val uneven = Seq((1, Seq(1, 2), Seq(1, 130))).toDF("id", "a", "b")
      .select(BitsetJaccard(IntArrayBitset($"a", 1), IntArrayBitset($"b", 3)).as("j"))
      .collect()
    assert(uneven.head.getDouble(0) == 1.0 / 3.0)
  }

  test("rejects non-int-array input at analysis") {
    val df = Seq((1, Seq("a"))).toDF("id", "a")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(IntArrayBitset($"a", 2)).collect()
    }
  }
}
