package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** keepCanonical: per-cluster best-document selection. */
class KeepCanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("keeps highest score per cluster, ties to lowest id, singletons stay") {
    val docs = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 30.0),   // cluster {1,2,3}: 2 wins tie
      (4L, 5.0), (5L, 50.0),                // cluster {4,5}: 5 wins
      (9L, 1.0)                             // singleton: kept
    ).toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("i", "j")
    val kept = Dedup.keepCanonical(docs, "id", pairs, "score")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 5L, 9L))
  }

  test("full row schema is preserved") {
    val docs = Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "txt", "q")
    val pairs = Seq((1L, 2L)).toDF("i", "j")
    val kept = Dedup.keepCanonical(docs, "id", pairs, "q")
    assert(kept.columns.toSeq == Seq("id", "txt", "q"))
    assert(kept.as[(Long, String, Double)].collect().toSeq ==
      Seq((2L, "b", 3.0)))
  }

  test("null scores rank worst; all-null cluster keeps lowest id") {
    val docs = Seq(
      (1L, Some(0.5)), (2L, None),          // 1 wins: real beats null
      (7L, Option.empty[Double]), (8L, None) // all-null: lowest id
    ).toDF("id", "score")
    val pairs = Seq((1L, 2L), (7L, 8L)).toDF("i", "j")
    val kept = Dedup.keepCanonical(docs, "id", pairs, "score")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 7L))
  }

  test("NaN score fails loudly instead of crowning a corrupt row") {
    val docs = Seq((1L, Double.NaN), (2L, 1.0)).toDF("id", "score")
    val pairs = Seq((1L, 2L)).toDF("i", "j")
    val e = intercept[Exception] {
      Dedup.keepCanonical(docs, "id", pairs, "score").collect()
    }
    assert(e.getMessage != null)
  }

  test("non-numeric id refuses up front") {
    val docs = Seq(("a", 1.0)).toDF("id", "score")
    val pairs = Seq(("a", "b")).toDF("i", "j")
    val e = intercept[IllegalArgumentException] {
      Dedup.keepCanonical(docs, "id", pairs, "score")
    }
    assert(e.getMessage.contains("integral id"))
  }

  test("fractional id refuses up front (the tie-break would truncate it)") {
    // 1.5 and 1.2 both cast to long 1 — the negated tie-break could not
    // tell them apart and the semi-join would reconstruct an id that
    // matches NEITHER row, silently dropping the cluster
    val docs = Seq((1.5, 10.0), (1.2, 10.0)).toDF("id", "score")
    val pairs = Seq((1.5, 1.2)).toDF("i", "j")
    val e = intercept[IllegalArgumentException] {
      Dedup.keepCanonical(docs, "id", pairs, "score")
    }
    assert(e.getMessage.contains("integral id"))
  }
}
