package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Codegen/interpreted parity for every native expression.
  *
  * Each native carries two implementations: `doGenCode` (the whole-stage
  * hot path every query compiles) and `eval` (the path Catalyst uses for
  * constant folding, interpreted-projection fallback, and codegen
  * compilation failures). The per-expression specs exercise codegen via
  * DataFrames; a divergence in `eval` would be invisible to them until a
  * fallback silently changed results — the classic silent-divergence bug
  * class for custom expressions.
  *
  * This spec runs one edge-heavy query per native under
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` and `NO_CODEGEN` (with
  * whole-stage off) and requires BIT-IDENTICAL row sets: nulls, empties,
  * NaN/Infinity, unicode beyond the BMP, length mismatches, dictionary
  * misses — the inputs where two hand-maintained implementations drift.
  */
class CodegenParitySpec extends SparkSpec {
  import spark.implicits._

  private def collectWith(df: => DataFrame, mode: String): Seq[Seq[Any]] = {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevWhole =
      spark.conf.getOption("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      spark.conf.set("spark.sql.codegen.wholeStage",
        (mode == "CODEGEN_ONLY").toString)
      // NaN != NaN under ==; compare doubles by canonical bits instead
      def norm(v: Any): Any = v match {
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case f: Float => java.lang.Float.floatToIntBits(f)
        case s: scala.collection.Seq[_] => s.map(norm)
        case other => other
      }
      df.collect().toSeq.map(_.toSeq.map(norm))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevWhole.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
    }
  }

  private def assertParity(label: String)(df: => DataFrame): Unit = {
    val gen = collectWith(df, "CODEGEN_ONLY")
    val interp = collectWith(df, "NO_CODEGEN")
    assert(gen == interp,
      s"$label diverged between codegen and interpreted eval:\n" +
        s"  codegen:     $gen\n  interpreted: $interp")
  }

  private val doubles: DataFrame = Seq(
    (1, Option(Seq(1.0, -2.5, 3.25)), Option(Seq(0.5, 4.0, -1.0))),
    (2, Option(Seq(Double.NaN, 1.0, 0.0)), Option(Seq(1.0, 1.0, 1.0))),
    (3, Option(Seq(Double.PositiveInfinity, -0.0, 1e308)),
      Option(Seq(1.0, 2.0, 1.0))),
    (4, Option(Seq(1.0, 2.0)), Option(Seq(1.0))), // length mismatch
    (5, None, Option(Seq(1.0, 2.0))), // null side
    (6, Option(Seq.empty[Double]), Option(Seq.empty[Double])))
    .toDF("id", "a", "b")

  test("VectorDot: NaN/Inf/-0.0, mismatch, null, empty") {
    assertParity("VectorDot") {
      doubles.select($"id", VectorDot($"a", $"b"))
    }
  }

  test("LshSignBucket: sign planes over NaN/Inf and nulls") {
    assertParity("LshSignBucket") {
      // dim must match the vector length where defined (3)
      doubles.filter($"id" =!= 4).select($"id",
        LshSignBucket($"a", dim = 3, planes = 4))
    }
  }

  test("HilbertIndex: negative, boundary and null coordinates") {
    val ints = Seq(
      (1, Option(0L), Option(0L)),
      (2, Option(255L), Option(255L)),
      (3, Option(-5L), Option(3L)), // clamps / wraps must agree
      (4, None, Option(7L)),
      (5, Option((1L << 20) + 7L), Option(13L))) // beyond 2^bits
      .toDF("id", "x", "y")
    assertParity("HilbertIndex") {
      ints.select($"id", HilbertIndex(Seq($"x", $"y"), bits = 8))
    }
  }

  test("Md5Prefix: unicode, empty string, null") {
    val strs = Seq(
      (1, Option("hello")),
      (2, Option("")),
      (3, Option("café 😀 漢字")),
      (4, None)).toDF("id", "s")
    assertParity("Md5Prefix") {
      strs.select($"id", Md5Prefix($"s", hexChars = 8))
    }
  }

  test("CharShinglesSorted / WordShinglesSorted: short, unicode, null") {
    val strs = Seq(
      (1, Option("abcabc")),
      (2, Option("ab")), // shorter than n
      (3, Option("😀😁😀x")), // surrogates
      (4, Option("")),
      (5, None)).toDF("id", "s")
    assertParity("CharShinglesSorted") {
      strs.select($"id", ShingleExpressions.charShinglesSorted($"s", 3))
    }
    val toks = Seq(
      (1, Option(Seq("a", "b", "a", "c"))),
      (2, Option(Seq("only"))),
      (3, Option(Seq.empty[String])),
      (4, None)).toDF("id", "t")
    assertParity("WordShinglesSorted") {
      toks.select($"id", ShingleExpressions.wordShinglesSorted($"t", 2))
    }
  }

  test("SortedArrayJaccard: duplicates, empties, nulls") {
    val arrs = Seq(
      (1, Option(Seq(1L, 2L, 3L)), Option(Seq(2L, 3L, 4L))),
      (2, Option(Seq(1L, 1L, 2L)), Option(Seq(1L, 2L, 2L))), // dups
      (3, Option(Seq.empty[Long]), Option(Seq.empty[Long])),
      (4, Option(Seq(1L)), None)).toDF("id", "a", "b")
    assertParity("SortedArrayJaccard") {
      arrs.select($"id", SortedArrayJaccard($"a", $"b"))
    }
  }

  test("IntArrayBitset + BitsetJaccard: boundary ids, empties, nulls") {
    val ids = Seq(
      (1, Option(Seq(0, 5, 63)), Option(Seq(5, 64, 127))), // word boundaries
      (2, Option(Seq(127)), Option(Seq(0))), // last valid bit
      (3, Option(Seq.empty[Int]), Option(Seq.empty[Int])), // NaN jaccard
      (4, None, Option(Seq(1)))).toDF("id", "a", "b")
    assertParity("IntArrayBitset/BitsetJaccard") {
      ids.select($"id",
        BitsetJaccard(IntArrayBitset($"a", words = 2),
          IntArrayBitset($"b", words = 2)))
    }
  }

  test("IntArrayBitset refuses out-of-universe ids loudly in BOTH paths") {
    val bad = Seq((1, Seq(200)), (2, Seq(-1))).toDF("id", "a")
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val e = intercept[Exception] {
        collectWith(bad.select(IntArrayBitset($"a", words = 2)), mode)
      }
      def msg(t: Throwable): String =
        (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => String.valueOf(x.getMessage))).mkString(" | ")
      assert(msg(e).contains("outside the declared universe"),
        s"[$mode] expected the named refusal, got: ${msg(e)}")
    }
  }

  test("InternSortedIds: dictionary misses, dups, empty, null") {
    val dict = Map("alpha" -> 3, "beta" -> 1, "gamma" -> 2)
    val toks = Seq(
      (1, Option(Seq("alpha", "beta", "alpha"))),
      (2, Option(Seq("missing", "beta"))),
      (3, Option(Seq.empty[String])),
      (4, None)).toDF("id", "t")
    assertParity("InternSortedIds") {
      toks.select($"id", InternSortedIds($"t", dict))
    }
  }

  test("BpeTokenCounts: merges, unknown chars, empty, null") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val words = Seq(
      (1, Option(Seq("abc", "abcabc"))),
      (2, Option(Seq("zzz", ""))),
      (3, Option(Seq.empty[String])),
      (4, None)).toDF("id", "w")
    assertParity("BpeTokenCounts") {
      words.select($"id", BpeTokenCounts($"w", merges))
    }
  }
}
