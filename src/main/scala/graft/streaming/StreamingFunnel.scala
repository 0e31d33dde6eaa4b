package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One typed event on the stream. */
case class StepEvent(user_id: Long, ts: Timestamp, event_type: String)

/** Per-key funnel state: `reach(i)` = micros the entity reached step i
  * (prefix-filled), `pending` = (micros, stepIdx) events still above the
  * watermark, NOT yet safe to fold. */
case class FunnelProgress(reach: Seq[Long], pending: Seq[(Long, Int)])

/** Emitted exactly once per entity, when the last step is reached. */
case class FunnelCompletion(user_id: Long, step_ts: Seq[Timestamp])

/** Streaming ordered funnel — the stateful counterpart of
  * `operators.Funnel` (same strict rule: step k counts only STRICTLY
  * after the entity reached step k−1), exact under out-of-order arrival.
  *
  * Why buffering is the exact design: the funnel fold is
  * order-sensitive (an early `view` arriving late can retroactively
  * unlock a `click` already seen), so events fold into the reach vector
  * only once the WATERMARK passes them — at that point no earlier event
  * can arrive, the below-watermark slice is complete, and folding it in
  * event-time order reproduces the batch algorithm on that prefix
  * exactly. Reach times depend only on events at or before their own
  * value, so a reach prefix computed from a complete prefix is FINAL —
  * a completion can be emitted the moment the last step is reached, and
  * the key's state dropped (classic funnels convert an entity once).
  *
  * State per key is O(steps + events inside the watermark lag): the
  * reach vector is `steps` longs, and `pending` holds only the
  * not-yet-drainable tail — bounded by the allowed lateness, NOT by
  * stream length. Irrelevant event types are filtered before the state
  * op, so they never shuffle or buffer.
  */
object StreamingFunnel {

  import EventTimeCodec.{usOf, tsOf}

  /** Fold drainable events (complete, event-time-ordered prefix) into the
    * reach vector — the batch rule verbatim. */
  private def fold(reach: Seq[Long], drained: Seq[(Long, Int)], nSteps: Int): Seq[Long] =
    drained.sortBy(_._1).foldLeft(reach) { case (r, (ts, idx)) =>
      if (r.length < nSteps && idx == r.length && (r.isEmpty || ts > r.last)) r :+ ts
      else r
    }

  def completions(events: Dataset[StepEvent], steps: Seq[String],
                  watermarkDelay: String): Dataset[FunnelCompletion] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val sp = events.sparkSession
    import sp.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val n = steps.size
    events
      .filter(e => stepIdx.contains(e.event_type))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelCompletion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[StepEvent], state: GroupState[FunnelProgress]) =>
          val prior = state.getOption.getOrElse(FunnelProgress(Nil, Nil))
          val incoming = it.map(e => (usOf(e.ts), stepIdx(e.event_type))).toSeq
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // events strictly below the watermark can never gain earlier
          // company — they are a complete prefix, fold them now
          val (drainable, stillPending) =
            (prior.pending ++ incoming).partition(_._1 < wmUs)
          val reach = fold(prior.reach, drainable, n)
          if (reach.length == n) {
            state.remove() // converted: exactly-once by construction
            Iterator.single(FunnelCompletion(user, reach.map(tsOf)))
          } else {
            // an empty reach vector with nothing buffered gates nothing —
            // drop the key (a later step-1 event rebuilds from scratch);
            // a non-empty prefix must persist: it gates the next step
            if (reach.isEmpty && stillPending.isEmpty) state.remove()
            else state.update(FunnelProgress(reach, stillPending))
            // wake when the watermark passes the earliest buffered event
            if (stillPending.nonEmpty) {
              val deadlineMs = stillPending.map(_._1).min / 1000L + 1L
              state.setTimeoutTimestamp(
                math.max(deadlineMs, state.getCurrentWatermarkMs() + 1L))
            }
            Iterator.empty
          }
      }
  }
}
