package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the stream: entity key + event time. */
case class SessionEvent(user_id: Long, ts: Timestamp)

/** An open (still extendable) session interval, times in epoch micros. */
case class OpenInterval(start: Long, last: Long, n: Long)

/** Per-key state: the open intervals, ordered by start. Usually one;
  * out-of-order arrival inside the watermark can briefly hold several. */
case class UserSessions(open: Seq[OpenInterval])

/** A completed session — emitted exactly once, in Append mode. */
case class ClosedSession(user_id: Long, session_start: Timestamp,
                         session_end: Timestamp, n_events: Long)

/** Streaming sessionization with `flatMapGroupsWithState` — the stateful
  * counterpart of the batch gap-sessionizer behind `q_events_sessions`
  * (same rule: a gap STRICTLY greater than `gapUs` starts a new session).
  *
  * Design (the 100 TB streaming story):
  *  - state is per-key and O(open sessions) — normally ONE small triple
  *    per user, never a buffer of events. Events fold into intervals the
  *    moment they arrive (classic interval merge with a `gap` slack), so
  *    a key with a million events holds 24 bytes of state, not a list;
  *  - out-of-order arrival inside the watermark is handled exactly: a
  *    point landing between two intervals within `gap` of both merges
  *    them (counts add); a point older than every interval opens its own
  *    — the general case a `last-event-only` state would get wrong;
  *  - close is WATERMARK-driven, not processing-time: an interval whose
  *    `last + gap` is behind the current watermark can never be extended
  *    (older events are dropped by the watermark filter), so it is
  *    emitted and freed — on data arrival or on the event-time timeout
  *    the state registers for its earliest still-open deadline. Exactly
  *    one `ClosedSession` per session, Append-mode, replay-safe;
  *  - the shuffle is the one `groupByKey(user)` exchange every stateful
  *    operator pays; state store entries are keyed by user, so scale-out
  *    is linear in executors.
  */
object Sessionize {

  import EventTimeCodec.{usOf, tsOf}

  /** Merge sorted-by-start intervals, coalescing any pair within gap. */
  private def coalesce(sorted: Seq[OpenInterval], gapUs: Long): Seq[OpenInterval] =
    sorted.foldLeft(List.empty[OpenInterval]) {
      case (acc @ (h :: t), i) if i.start <= h.last + gapUs =>
        OpenInterval(h.start, math.max(h.last, i.last), h.n + i.n) :: t
      case (acc, i) => i :: acc
    }.reverse

  /** `watermarkDelay` is the allowed lateness (e.g. "10 minutes"); events
    * later than that are dropped by the stream, which is exactly what
    * makes the watermark-driven close correct. */
  def sessions(events: Dataset[SessionEvent], gapUs: Long,
               watermarkDelay: String): Dataset[ClosedSession] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSessions, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[UserSessions]) =>
          val prior = state.getOption.map(_.open).getOrElse(Seq.empty)
          val points = it.map(e => OpenInterval(usOf(e.ts), usOf(e.ts), 1L)).toSeq
          val merged =
            if (points.isEmpty) prior
            else coalesce((prior ++ points).sortBy(i => (i.start, i.last)), gapUs)
          // watermark-driven close: un-extendable intervals leave state now
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(i => i.last + gapUs < wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(UserSessions(open))
            // fire when the earliest deadline passes the watermark (+1 ms:
            // the timeout is defined as watermark STRICTLY past the stamp)
            val deadlineMs = open.map(i => i.last + gapUs).min / 1000L + 1L
            state.setTimeoutTimestamp(math.max(deadlineMs, state.getCurrentWatermarkMs() + 1L))
          }
          closed.iterator.map(i =>
            ClosedSession(user, tsOf(i.start), tsOf(i.last), i.n))
      }
  }
}
