package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel progression — the continuous form of
  * operators/EventAnalytics.funnelReach: per user, advance an ordered
  * step chain as events arrive and emit one record per step ADVANCE
  * the moment it happens (Append mode), instead of recomputing the
  * funnel over the full log.
  *
  * Semantics vs the batch operator: within a micro-batch events are
  * processed in (event-time, step) order — identical to the batch
  * greedy fold — and the chain state carries across batches. Arrivals
  * out of event-time order ACROSS batches cannot retro-advance an
  * earlier step (the stream has already moved on); that is the
  * standard streaming-funnel trade, and the batch operator is the
  * replayable gold form.
  *
  * State story at 100 TB: one small record per user currently INSIDE
  * the funnel. With a step gap configured, state carries an event-time
  * timeout at `reach + gap` — once the watermark passes the last
  * possible advance, the user's state is dropped (a user who lapsed
  * can never advance again), so state is bounded by users active
  * within the gap window, not by users ever seen.
  */
object StreamingFunnel {

  case class Event(ts: Timestamp, user_id: Long, event_type: String)

  /** `step` = number of steps reached so far (also the 0-based index of
    * the NEXT step wanted); `reachMs` = when the last step was reached. */
  case class FunnelState(step: Int, reachMs: Long)

  case class Advance(user_id: Long, step: Int, event_type: String, ts: Timestamp)

  /** events must carry a watermark on `ts` when `maxGapMinutes` is set
    * (the state timeout requires one). Emits one row per step advance.
    */
  def advances(events: Dataset[Event], steps: Seq[String],
               maxGapMinutes: Option[Int] = None): Dataset[Advance] = {
    require(steps.size >= 2, "advances: need at least 2 steps")
    require(steps.distinct.size == steps.size, "advances: steps must be distinct")
    val gapMs = maxGapMinutes.map(_ * 60L * 1000L)
    val idxOf = steps.zipWithIndex.toMap
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[Advance]
    implicit val longEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) {
            // the gap window lapsed: this user can never advance again
            state.remove()
            Iterator.empty
          } else {
            val evs = rows.flatMap(e => idxOf.get(e.event_type).map(i => (e, i)))
              .toSeq.sortBy { case (e, i) => (e.ts.getTime, i) }
            var cur = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val out = Seq.newBuilder[Advance]
            evs.foreach { case (e, i) =>
              val t = e.ts.getTime
              val inWindow = cur.step == 0 ||
                (t >= cur.reachMs && gapMs.forall(g => t <= cur.reachMs + g))
              if (i == cur.step && cur.step < steps.size && inWindow) {
                cur = FunnelState(cur.step + 1, t)
                out += Advance(userId, cur.step, steps(i), e.ts)
              }
            }
            if (cur.step > 0) {
              state.update(cur)
              // expire once no event can extend the chain; clamped above
              // the watermark — a lapsed user touched by late data would
              // otherwise set an already-passed timeout, which throws
              gapMs.foreach(g => state.setTimeoutTimestamp(
                math.max(cur.reachMs + g, state.getCurrentWatermarkMs + 1)))
            }
            out.result().iterator
          }
        })
  }
}
