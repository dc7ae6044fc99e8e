package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the events stream (SURVEY §2.B
  * X10-X14). Every builder takes a DataFrame that may be either a
  * batch frame or a readStream frame — the plans are identical, which
  * is how the batch forms (queries/Events.scala) and the streaming
  * forms (MemoryStream tests) share semantics.
  *
  * Watermarks bound state for the 100 TB/continuous case: state for
  * windows older than the watermark is dropped, late rows beyond it
  * are discarded in append mode.
  */
object EventStreams {

  /** X10: tumbling hourly counts/sums per event type. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"), col("sv"))

  /** X11: sliding 1h window every 15 minutes. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))

  /** X12: session windows with a 30-minute gap, per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("user_id"), col("n_events"))

  /** Stream-static enrichment join: the static side is planned per
    * micro-batch (broadcast for dimension-sized tables), the classic
    * event-enrichment shape. No watermark needed — the static side
    * never ages. */
  def enriched(events: DataFrame, static: DataFrame,
               eventKey: String, staticKey: String): DataFrame =
    events.join(static, col(eventKey) === col(staticKey), "left")

  /** X14: streaming dedup by event_id bounded by the watermark. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** X9/X13 stream-STREAM interval join: correlate two event streams on
    * a key where the right event lands within [0, interval] after the
    * left one (click-attribution shape). Both sides carry watermarks
    * and the join condition bounds event-time distance, so Spark can
    * compute how long each side's state must be retained and evict it
    * — the state-bounded form that survives an unbounded stream. The
    * inputs must expose distinct column names (pre-aliased). */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   interval: String = "10 minutes",
                   watermark: String = "10 minutes",
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    // "left_outer" emits the unmatched left row (right columns null)
    // once the watermark proves no in-interval partner can still
    // arrive — the attribution-with-timeout shape ("view that never
    // converted"). Spark requires the time bound on BOTH sides for
    // outer stream-stream joins; this condition provides it.
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $interval"),
      joinType)
  }
}
