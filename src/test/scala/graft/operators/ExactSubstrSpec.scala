package graft.operators

import graft.SparkSpec

/** ExactSubstr dedup (Lee et al. 2022): duplicated-window marking +
  * island merge must reconstruct the maximal duplicated token spans, and
  * the strip must drop exactly the span-covered tokens. */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  // minLen = 4 throughout.
  //  A/B share the 6-token run "a b c d e f" (A pos 0..5, B pos 2..7);
  //  C is a verbatim 3x self-repeat (every window duplicated IN-doc);
  //  D has one unique window; E is empty; F is under minLen;
  //  G/H share two 4-token runs separated by >minLen unique tokens.
  private val docs = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "x x a b c d e f y z w q"),
    (3L, "p q r s p q r s p q r s"),
    (4L, "solo words only here"),
    (5L, ""),
    (6L, "one two three"),
    (7L, "m1 m2 m3 m4 u1 u2 u3 u4 u5 n1 n2 n3 n4"),
    (8L, "m1 m2 m3 m4 k1 k2 k3 k4 k5 n1 n2 n3 n4")
  ).toDF("doc_id", "text")

  test("spans: shared runs, self-repeats, and split islands") {
    val spans = Dedup.exactSubstrSpans(docs, "doc_id", "text", minLen = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set(
      (1L, 0, 5), (2L, 2, 7),        // shared 6-token run
      (3L, 0, 11),                   // whole doc: self-repeated
      (7L, 0, 3), (7L, 9, 12),       // two islands, gap > minLen
      (8L, 0, 3), (8L, 9, 12)))
  }

  test("stats: every doc reported, zeros for clean/short/empty docs") {
    val out = Dedup.exactSubstrStats(docs, "doc_id", "text", minLen = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(out.size == 8)
    assert(out(1L) == ((10, 1L, 6L, 0.6)))
    assert(out(2L) == ((12, 1L, 6L, 0.5)))
    assert(out(3L) == ((12, 1L, 12L, 1.0)))
    assert(out(4L) == ((4, 0L, 0L, 0.0)))
    assert(out(5L) == ((0, 0L, 0L, 0.0)))
    assert(out(6L) == ((3, 0L, 0L, 0.0)))
    assert(out(7L) == ((13, 2L, 8L, 8.0 / 13)))
    assert(out(8L) == ((13, 2L, 8L, 8.0 / 13)))
  }

  test("strip drops exactly the covered tokens, keeps order") {
    val out = Dedup.exactSubstrStrip(docs, "doc_id", "text", minLen = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("g h i j", 4L)))
    assert(out(2L) == (("x x y z w q", 6L)))
    assert(out(3L) == (("", 0L)))              // fully duplicated
    assert(out(4L) == (("solo words only here", 4L)))
    assert(out(5L) == (("", 0L)))
    assert(out(6L) == (("one two three", 3L)))
    assert(out(7L) == (("u1 u2 u3 u4 u5", 5L)))
  }

  test("minCount 3 keeps only the triple self-repeat") {
    val spans = Dedup.exactSubstrSpans(docs, "doc_id", "text",
        minLen = 4, minCount = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // only "p q r s" (and its rotations at occ 2) — windows with occ >= 3
    // are exactly the three aligned "p q r s" starts 0, 4, 8; their
    // coverage [0,3]+[4,7]+[8,11] merges into one span
    assert(spans == Set((3L, 0, 11)))
  }
}
