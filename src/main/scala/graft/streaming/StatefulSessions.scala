package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-state sessionization (SURVEY §2.B X14, the
  * flatMapGroupsWithState half): custom per-user session logic that
  * the built-in session_window can't express — here, sessions carry a
  * running event count and emit a record the moment they CLOSE (gap
  * exceeded or event-time timeout), not when the window is finalized.
  *
  * State is bounded by the event-time timeout: a user's state is
  * dropped `gapMinutes` past their last event as the watermark
  * advances — the 100 TB/continuous-ingest safety property.
  */
object StatefulSessions {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(startMs: Long, lastMs: Long, nEvents: Int)

  case class ClosedSession(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Int)

  /** events must carry a watermark on `ts` before calling (the event
    * time timeout requires it). Emits one row per CLOSED session. */
  def closedSessions(events: Dataset[Event], gapMinutes: Int): Dataset[ClosedSession] = {
    val gapMs = gapMinutes * 60L * 1000L
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          def close(s: SessionState) = ClosedSession(
            userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.nEvents)

          if (state.hasTimedOut) {
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val evs = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            evs.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(s.copy(lastMs = math.max(s.lastMs, t), nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed += close(s)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
        })
  }
}
