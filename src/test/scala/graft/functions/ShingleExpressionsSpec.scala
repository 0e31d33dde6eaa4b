package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShingleExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native char shingles equal the composed form, incl. unicode") {
    val rng = new scala.util.Random(11)
    val alphabet = "abç日本語 xyz"
    val rows = (1 to 200).map { i =>
      (i, (0 until rng.nextInt(60)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }
    val df = rows.toDF("id", "text")
    val out = df.select($"id",
        ShingleExpressions.charShinglesSorted($"text", 3).as("fast"),
        array_sort(charShingles($"text", 3)).as("reference"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"id=${r.getInt(0)}")
    }
  }

  test("native word shingles equal the composed form") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 200).map { i =>
      (i, (0 until rng.nextInt(20)).map(_ => s"w${rng.nextInt(9)}").mkString(" "))
    }
    val df = rows.toDF("id", "text")
      .select($"id", tokens($"text").as("toks"))
    val out = df.select($"id",
        ShingleExpressions.wordShinglesSorted($"toks", 3).as("fast"),
        array_sort(wordShinglesOf($"toks", 3)).as("reference"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"id=${r.getInt(0)}")
    }
  }

  test("null text yields null; short text yields empty") {
    val df = Seq((1, null: String), (2, "ab")).toDF("id", "text")
    val out = df.select($"id",
      ShingleExpressions.charShinglesSorted($"text", 3).as("g")).collect()
    assert(out.find(_.getInt(0) == 1).get.isNullAt(1))
    assert(out.find(_.getInt(0) == 2).get.getSeq[String](1).isEmpty)
  }
}
