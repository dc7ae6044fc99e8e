package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

import graft.functions.KllBuffer

/** Per-key ROLLING quantiles over an unbounded stream — the streaming
  * face of the round-12 mergeable KLL sketch
  * ([[graft.operators.Stats.groupedQuantilesSketch]]'s state reused as
  * `transformWithState` state): after each micro-batch, every key that
  * received rows emits one snapshot of its all-history quantiles.
  * This is the "live p50/p99 per user/source/model" panel a training
  * or serving pipeline watches, computed WITHOUT retaining the values:
  * per-key state is the O(k·log n) compactor ladder (a few KB at any
  * history length), serialized into the RocksDB store through the same
  * self-contained wire format the batch aggregate shuffles
  * ([[KllBuffer.toBytes]]), so state survives checkpoint/restart like
  * every other stateful operator here.
  *
  * Contrast with the windowed-aggregation route: a sliding
  * `percentile_approx` window buffers rows per window and forgets
  * history when the window closes; this processor's snapshot covers
  * the key's WHOLE stream at O(k log n) state — the thing watermarked
  * windows structurally cannot do. No timers and no watermark
  * requirement (TimeMode.None): nothing here expires, because the
  * state is size-bounded by construction rather than time-bounded.
  * Exactness follows the sketch's contract: exact until a key's level
  * fills (< k values), ε ≈ 1/k rank error beyond
  * (QuantileSketchSpec).
  */
object TwsQuantiles {

  /** One per-key snapshot per micro-batch: n = values absorbed so far,
    * `qs(i)` = the running quantile at `ps(i)`. */
  case class QuantileSnapshot(key: Long, n: Long, qs: Seq[Double])

  private class QuantileProcessor(ps: Seq[Double], k: Int)
      extends StatefulProcessor[Long, StatefulSessions.Event, QuantileSnapshot] {
    @transient private var sketch: org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sketch = getHandle.getValueState[Array[Byte]](
        "sketch", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long,
                                 rows: Iterator[StatefulSessions.Event],
                                 timerValues: TimerValues): Iterator[QuantileSnapshot] = {
      val buf =
        if (sketch.exists()) KllBuffer.fromBytes(sketch.get()) else new KllBuffer(k)
      var absorbed = false
      rows.foreach { e =>
        if (!e.value.isNaN) { buf.add(e.value); absorbed = true }
      }
      if (!absorbed) Iterator.empty
      else {
        sketch.update(KllBuffer.toBytes(buf))
        Iterator.single(
          QuantileSnapshot(key, buf.count, buf.quantiles(ps).toSeq))
      }
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[QuantileSnapshot] =
      Iterator.empty // no timers registered — state is size-bounded, not time-bounded
  }

  /** Rolling per-user quantiles of `value`. Update-mode output (a
    * key's snapshot supersedes its previous one); NaN values skipped
    * (the streaming stand-in for the batch NULL policy — a typed
    * Dataset[Event] has no null doubles). */
  def rollingQuantiles(events: Dataset[StatefulSessions.Event],
                       ps: Seq[Double], k: Int = 256): Dataset[QuantileSnapshot] = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"rollingQuantiles: quantiles must be in (0, 1], got $ps")
    implicit val outEnc = Encoders.product[QuantileSnapshot]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .transformWithState(new QuantileProcessor(ps, k),
        TimeMode.None(), OutputMode.Update())
  }
}
