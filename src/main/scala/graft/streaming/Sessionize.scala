package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Custom-state sessionization via `flatMapGroupsWithState` — the escape
  * hatch for stateful semantics the declarative operators can't express
  * (SURVEY.md §2.9: the reference never needed it; a complete engine
  * exposes it).
  *
  * Semantics: per-user gap-based sessions, correct under CROSS-BATCH
  * disorder. State holds ALL open sessions for the key (not just the
  * newest): each arriving event becomes a 1-event session and the set
  * is re-merged — any two sessions within `gapMs` of each other
  * coalesce, so a late (above-watermark) event that lands BEFORE an
  * open session extends it backwards or bridges two sessions, instead
  * of being glued to the wrong end. (A single-session state gets this
  * wrong: an event earlier than `start` but outside the gap would
  * join, and `session_start` could never move earlier.)
  *
  * A session is emitted ONLY once the watermark passes its end + gap —
  * nothing earlier can still extend it — so emissions are final, as
  * Append mode requires. State is bounded by open sessions inside the
  * watermark horizon; the event-time timeout fires at the earliest
  * open end + gap and clears what it seals.
  *
  * Used with `.groupByKey(_.user_id)` on a watermarked Dataset; output
  * mode must be Append.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Int, value: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int, session_value: Double)

  def flatMapSessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def fn(user: Long, rows: Iterator[Event],
           state: GroupState[Seq[SessionState]]): Iterator[Session] = {
      val wm = state.getCurrentWatermarkMs()
      val prior = state.getOption.getOrElse(Seq.empty)
      val incoming = rows.map(e =>
        SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)).toSeq
      // normalize: sort all open sessions + new singletons by start and
      // coalesce neighbors within the gap (also bridges two sessions a
      // late event lands between)
      val merged = (prior ++ incoming).sortBy(s => (s.start, s.end))
        .foldLeft(List.empty[SessionState]) {
          case (h :: t, s) if s.start <= h.end + gapMs =>
            SessionState(h.start, math.max(h.end, s.end), h.n + s.n,
              h.value + s.value) :: t
          case (acc, s) => s :: acc
        }.reverse
      // the watermark seals a session once nothing can extend it
      val (closed, open) = merged.partition(s => s.end + gapMs <= wm)
      if (open.nonEmpty) {
        state.update(open)
        state.setTimeoutTimestamp(open.map(_.end + gapMs).min)
      } else state.remove()
      closed.sortBy(_.start).iterator.map(s =>
        Session(user, new Timestamp(s.start), new Timestamp(s.end),
          s.n, math.round(s.value * 100.0) / 100.0))
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
