package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, "a", ts("2026-01-01 10:00:05")),
    (2L, "a", ts("2026-01-01 10:00:10")),
    (3L, "b", ts("2026-01-01 10:00:01")),
    (4L, "b", ts("2026-01-01 10:00:20"))
  ).toDF("trade_id", "sym", "t")

  private val quotes = Seq(
    (101L, "a", ts("2026-01-01 10:00:00"), 1.0),
    (102L, "a", ts("2026-01-01 10:00:05"), 2.0), // exactly AT trade 1
    (103L, "a", ts("2026-01-01 10:00:07"), 3.0),
    (104L, "b", ts("2026-01-01 10:00:02"), 4.0)  // after trade 3
  ).toDF("quote_id", "sym", "qt", "px")

  private def join() = Temporal.asofJoin(trades, quotes, Seq("sym"),
    leftTime = "t", rightTime = "qt", rightTieBreak = "quote_id",
    rightPayload = Seq("quote_id", "px"))

  test("asof join picks the latest right row at-or-before each left time") {
    val got = join().collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("quote_id")).map(_.toLong)).toMap
    assert(got(1L).contains(102L)) // equal timestamp IS visible (<=)
    assert(got(2L).contains(103L))
    assert(got(3L).isEmpty)        // no quote precedes trade 3
    assert(got(4L).contains(104L))
  }

  test("asof join preserves every left row and its columns") {
    val out = join()
    assert(out.count() == 4)
    assert(out.columns.toSeq ==
      Seq("trade_id", "sym", "t", "quote_id", "px"))
  }

  test("ties on the right timestamp resolve to the greatest tiebreak") {
    val dupQuotes = quotes.unionByName(
      Seq((105L, "a", ts("2026-01-01 10:00:07"), 9.9))
        .toDF("quote_id", "sym", "qt", "px"))
    val got = Temporal.asofJoin(trades, dupQuotes, Seq("sym"),
      "t", "qt", "quote_id", Seq("quote_id", "px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("quote_id")).map(_.toLong)).toMap
    assert(got(2L).contains(105L))
  }

  test("a null right timestamp never fabricates a match") {
    val withNull = quotes.unionByName(
      Seq((999L, "b", null.asInstanceOf[Timestamp], 99.0))
        .toDF("quote_id", "sym", "qt", "px"))
    val got = Temporal.asofJoin(trades, withNull, Seq("sym"),
        leftTime = "t", rightTime = "qt", rightTieBreak = "quote_id",
        rightPayload = Seq("quote_id", "px"))
      .collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("quote_id")).map(_.toLong)).toMap
    // trade 3 has no genuine predecessor; the null-ts quote must NOT
    // become its match
    assert(got(3L).isEmpty)
    assert(got(1L).contains(102L) && got(4L).contains(104L))
  }

  test("tolerance bounds the lookback window") {
    val got = Temporal.asofJoin(trades, quotes, Seq("sym"),
        leftTime = "t", rightTime = "qt", rightTieBreak = "quote_id",
        rightPayload = Seq("quote_id", "px"),
        tolerance = Some("4 seconds"))
      .collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("quote_id")).map(_.toLong)).toMap
    assert(got(1L).contains(102L)) // 0s gap: inside tolerance
    assert(got(2L).contains(103L)) // 3s gap: inside
    assert(got(3L).isEmpty)
    assert(got(4L).isEmpty)        // 18s gap: quote 104 too old now
    // every left row still present
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("payload name collision with the left side is rejected") {
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades, quotes.withColumnRenamed("px", "t"),
        Seq("sym"), "t", "qt", "quote_id", Seq("t"))
    }
    assert(e.getMessage.contains("collides"))
  }
}
