package graft.delta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.unsafe.types.UTF8String

/** One timestamp-string parser for every user-facing option and SQL
  * surface (`startingTimestamp`, `endingTimestamp`, `RESTORE ... TO
  * TIMESTAMP`, `TIMESTAMP AS OF`, TVF bounds).
  *
  * `java.sql.Timestamp.valueOf` is the WRONG tool here twice over: it
  * rejects date-only strings like `2024-01-10` (which Delta's options
  * accept — ref: standalone's DeltaDataSource timestamp handling), and
  * it interprets the value in the JVM default timezone instead of
  * `spark.sql.session.timeZone`. Spark's own cast machinery
  * ([[DateTimeUtils.stringToTimestamp]]) accepts the full ANSI surface
  * (date-only, `T` separators, zone suffixes) and honors the session
  * zone for zone-less strings.
  */
object TimestampParsing {

  /** Parse `s` to epoch millis using the session timezone; throws
    * IllegalArgumentException on unparseable input (same failure class
    * callers already expect from `Timestamp.valueOf`). */
  def parseMillis(spark: SparkSession, s: String): Long = {
    val zone = DateTimeUtils.getZoneId(
      spark.sessionState.conf.sessionLocalTimeZone)
    val micros = DateTimeUtils
      .stringToTimestamp(UTF8String.fromString(s), zone)
      .getOrElse(throw new IllegalArgumentException(
        s"Cannot parse '$s' as a timestamp (expected e.g. " +
          "'2024-01-10' or '2024-01-10 12:34:56[.ffffff]')"))
    Math.floorDiv(micros, 1000L)
  }
}
