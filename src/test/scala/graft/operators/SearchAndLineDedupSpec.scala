package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Search.bm25TopK]] and [[Dedup.lineDedup]] semantics on hand-built
  * corpora (the oracled queries prove cross-engine equality; these pin
  * the ALGORITHM against hand-computed expectations). */
class SearchAndLineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("lineDedup counts corpus-wide occurrences; blank lines never dup") {
    val lines = Seq(
      (1L, 0, "COPYRIGHT 2026 ACME"),
      (1L, 1, "unique content one"),
      (1L, 2, ""),
      (2L, 0, "COPYRIGHT 2026 ACME"),
      (2L, 1, "  COPYRIGHT 2026 ACME  "), // trims equal
      (2L, 2, "   "),
      (3L, 0, "unique content three")
    ).toDF("doc_id", "line_idx", "line")
    val out = Dedup.lineDedup(lines, "line")
      .select($"doc_id", $"line_idx", $"line_occ")
      .as[(Long, Int, Long)].collect().toMap2
    assert(out((1L, 0)) == 3) // boilerplate counted across docs + trim
    assert(out((2L, 0)) == 3 && out((2L, 1)) == 3)
    assert(out((1L, 1)) == 1 && out((3L, 0)) == 1)
    assert(out((1L, 2)) == 1 && out((2L, 2)) == 1,
      "blank lines must not count as duplicates of each other")
  }

  private implicit class Tuples3(rows: Array[(Long, Int, Long)]) {
    def toMap2: Map[(Long, Int), Long] =
      rows.map { case (d, i, o) => (d, i) -> o }.toMap
  }

  test("bm25TopK ranks by tf saturation, length norm, and rarity") {
    // 4 docs, 8 tokens each (avgdl = dl for all: length norm neutral).
    // 'rare' appears in 1 doc, 'common' in all 4.
    val docs = Seq(
      (1L, "common a b c d e f g"),
      (2L, "common common common a b c d e"),
      (3L, "common rare a b c d e f"),
      (4L, "common a rare b c rare d e")
    ).toDF("id", "text")

    // single term, equal dl: ranking is by tf alone (saturating, but
    // monotone in tf) — doc 2 (tf 3) first, ties broken by id
    val byTf = Search.bm25TopK(spark, docs, "id", "text",
      Seq("q" -> Seq("common")), k = 4)
      .orderBy($"rank").select($"doc_id").as[Long].collect().toSeq
    assert(byTf == Seq(2L, 1L, 3L, 4L),
      s"tf 3 first, then tf 1 in id order: $byTf")

    // rare term dominates: docs with 'rare' outrank higher-tf 'common'
    val mixed = Search.bm25TopK(spark, docs, "id", "text",
      Seq("q" -> Seq("common", "rare")), k = 4)
      .orderBy($"rank").select($"doc_id").as[Long].collect().toSeq
    assert(mixed.take(2).toSet == Set(3L, 4L),
      s"rare-term docs must lead: $mixed")
    assert(mixed(0) == 4L, s"tf 2 of the rare term outranks tf 1: $mixed")

    // k truncates; scores strictly positive; rank dense from 1
    val top1 = Search.bm25TopK(spark, docs, "id", "text",
      Seq("q" -> Seq("rare")), k = 1).collect()
    assert(top1.length == 1 && top1.head.getAs[Int]("rank") == 1)
    assert(top1.head.getAs[Double]("score") > 0.0)

    // a term absent from the corpus contributes nothing; an all-absent
    // query returns no rows rather than zero-scored noise
    val none = Search.bm25TopK(spark, docs, "id", "text",
      Seq("q" -> Seq("zzz")), k = 3).collect()
    assert(none.isEmpty)
  }
}
