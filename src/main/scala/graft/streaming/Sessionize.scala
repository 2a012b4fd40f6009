package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Custom-state sessionization via `flatMapGroupsWithState` — the escape
  * hatch for stateful semantics the declarative operators can't express
  * (SURVEY.md §2.9: the reference never needed it; a complete engine
  * exposes it).
  *
  * Semantics: per-user gap-based sessions. An event extends the open
  * session if it arrives within `gapMs` of the session's current end;
  * otherwise the open session is emitted and a new one starts. On
  * event-time timeout (watermark passed session end + gap) the final
  * session is emitted and state cleared — so state is bounded by the
  * number of users active inside the watermark horizon, not all users
  * ever seen.
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
           state: GroupState[SessionState]): Iterator[Session] = {
      var out = List.empty[Session]
      var cur = state.getOption

      def close(s: SessionState): Unit =
        out ::= Session(user, new Timestamp(s.start), new Timestamp(s.end),
          s.n, math.round(s.value * 100.0) / 100.0)

      if (state.hasTimedOut) {
        cur.foreach(close)
        state.remove()
        return out.iterator
      }
      // Batch arrival order within a group is not guaranteed — sort by
      // event time so gap logic sees a consistent timeline.
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t <= s.end + gapMs =>
            cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1,
              s.value + e.value))
          case Some(s) =>
            close(s)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur match {
        case Some(s) =>
          state.update(s)
          // Emit the final session once the watermark clears end + gap.
          state.setTimeoutTimestamp(s.end + gapMs)
        case None => state.remove()
      }
      out.reverse.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
