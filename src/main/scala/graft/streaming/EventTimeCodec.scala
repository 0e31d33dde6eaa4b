package graft.streaming

import java.sql.Timestamp

/** Microsecond ↔ java.sql.Timestamp, exact (micros are what event-time
  * comparisons run on; Timestamp carries them via the nanos field). */
private[streaming] object EventTimeCodec {
  def usOf(t: Timestamp): Long = t.getTime * 1000L + t.getNanos / 1000 % 1000
  def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
