package graft.delta

import graft.SparkSpec

/** One parser for every user-facing timestamp option: must accept the
  * full ANSI surface (date-only included) and honor the SESSION timezone
  * rather than the JVM default — `java.sql.Timestamp.valueOf` got both
  * wrong. */
class TimestampParsingSpec extends SparkSpec {
  import spark.implicits._

  test("date-only and datetime forms parse in the session timezone") {
    // SparkSpec pins spark.sql.session.timeZone = UTC
    assert(TimestampParsing.parseMillis(spark, "1970-01-02") == 86400000L)
    assert(TimestampParsing.parseMillis(spark, "1970-01-01 00:00:01") == 1000L)
    assert(TimestampParsing.parseMillis(spark, "1970-01-01 00:00:00.5") == 500L)
    // T separator and explicit zone suffix
    assert(TimestampParsing.parseMillis(spark, "1970-01-01T01:00:00Z") ==
      3600000L)
    // session zone applies to zone-less strings (IST = UTC+5:30)
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try assert(TimestampParsing.parseMillis(spark, "1970-01-02") ==
      86400000L - (5 * 3600 + 30 * 60) * 1000L)
    finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    intercept[IllegalArgumentException] {
      TimestampParsing.parseMillis(spark, "not-a-time")
    }
  }

  test("date-only strings are accepted by the CDF TVF bounds") {
    withTempDir { dir =>
      DeltaTable.write(Seq(1).toDF("v"), dir)
      DeltaTable.write(Seq(2).toDF("v"), dir)
      val log = DeltaLog.forTable(spark, dir)
      // commits carry real wall-clock timestamps; a date-only lower
      // bound of today-or-earlier must parse and cover them
      val rows = spark.sql(
        s"SELECT * FROM graft_table_changes('$dir', '1970-01-01', " +
          s"${log.update().version})")
      assert(rows.count() >= 2)
    }
  }

  test("history() batches commit reads above the driver threshold") {
    withTempDir { dir =>
      (1 to 20).foreach(i =>
        DeltaTable.write(spark.range(i, i + 1).toDF("v"), dir))
      val h = DeltaLog.forTable(spark, dir).history()
      assert(h.size == 20)
      assert(h.flatMap(_.version) == (19L to 0L by -1L))
      assert(h.forall(_.operation.isDefined), "every commitInfo parsed")
      assert(h.forall(_.timestamp.isDefined))
    }
  }
}
