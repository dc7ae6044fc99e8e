package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.functions.KllBuffer

/** Bounded-HORIZON rolling quantiles — the windowed sibling of
  * [[TwsQuantiles]]: where that processor's one-sketch-per-key state
  * answers "p99 over everything this key ever sent",
  * this one answers the live-panel shape "p50/p99 over the last N
  * tumbling windows" (e.g. last 24 hourly windows), with old windows
  * ROLLING OFF as the key's event time advances.
  *
  * Mechanics per key — a ring of per-window sketches in [[MapState]]
  * (one RocksDB state row per (key, window), like
  * [[TwsRollingDistinct]]'s per-value rows — a hot key never loads or
  * rewrites its whole horizon to absorb one batch):
  *   - each input row updates the KLL sketch of its own tumbling
  *     window `floor(ts / windowMs) · windowMs`;
  *   - windows older than `newest − numWindows·windowMs` are evicted
  *     on every visit (newest = the key's max populated window), so
  *     state per key is ≤ numWindows sketches of O(k·log n) doubles
  *     — size-bounded AND time-bounded;
  *   - the emitted snapshot merges the ≤ numWindows retained sketches
  *     on read ([[KllBuffer.merge]] — the same mergeable-state
  *     property the batch roll-up exploits), so the horizon quantiles
  *     never need the raw values.
  *
  * Eviction keys off the KEY'S OWN event time, not the global
  * watermark — a panel over a quiet key keeps showing its last-known
  * horizon instead of draining to empty while other keys advance the
  * clock (TimeMode.None: no watermark requirement, no timers; a batch
  * with no rows for a key emits nothing, the
  * [[TwsQuantiles]] convention). Exactness follows the sketch's
  * contract: exact until a window's level fills (< k values), ε ≈ 1/k
  * rank error beyond (QuantileSketchSpec).
  */
object TwsWindowedQuantiles {

  /** One per-key snapshot per micro-batch that touched the key:
    * `window_start_ms` = start of the key's NEWEST populated window,
    * `n` = values inside the horizon, `qs(i)` = the horizon quantile
    * at `ps(i)`. */
  case class WindowedSnapshot(key: Long, window_start_ms: Long, n: Long,
                              qs: Seq[Double])

  private class Processor(ps: Seq[Double], k: Int, windowMs: Long,
                          numWindows: Int)
      extends StatefulProcessor[Long, StatefulSessions.Event, WindowedSnapshot] {
    @transient private var wins: MapState[Long, Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      wins = getHandle.getMapState[Long, Array[Byte]](
        "wins", Encoders.scalaLong, Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long,
                                 rows: Iterator[StatefulSessions.Event],
                                 timerValues: TimerValues): Iterator[WindowedSnapshot] = {
      // absorb the batch into per-window sketches (buffered per window
      // so a window's state row is deserialized/serialized once per
      // batch, not once per row)
      val touched = scala.collection.mutable.Map.empty[Long, KllBuffer]
      rows.foreach { e =>
        if (!e.value.isNaN) {
          val w = Math.floorDiv(e.ts.getTime, windowMs) * windowMs
          val buf = touched.getOrElseUpdate(w,
            if (wins.containsKey(w)) KllBuffer.fromBytes(wins.getValue(w))
            else new KllBuffer(k))
          buf.add(e.value)
        }
      }
      if (touched.isEmpty) return Iterator.empty
      touched.foreach { case (w, buf) => wins.updateValue(w, KllBuffer.toBytes(buf)) }
      // roll off windows that fell out of the horizon, then snapshot
      var newest = Long.MinValue
      val starts = Seq.newBuilder[Long]
      wins.keys().foreach { w => newest = math.max(newest, w); starts += w }
      val floor = newest - (numWindows - 1).toLong * windowMs
      val (dead, live) = starts.result().partition(_ < floor)
      dead.foreach(wins.removeKey)
      val merged = new KllBuffer(k)
      live.foreach(w => merged.merge(KllBuffer.fromBytes(wins.getValue(w))))
      Iterator.single(WindowedSnapshot(key, newest, merged.count,
        merged.quantiles(ps).toSeq))
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[WindowedSnapshot] =
      Iterator.empty // no timers — eviction rides the key's own input
  }

  /** Rolling per-user horizon quantiles of `value`: quantiles over the
    * last `numWindows` tumbling windows of `windowMinutes`, emitted in
    * update mode (a key's snapshot supersedes its previous one). NaN
    * values skipped (the batch NULL policy's typed stand-in). */
  def windowedQuantiles(events: Dataset[StatefulSessions.Event],
                        ps: Seq[Double], windowMinutes: Int,
                        numWindows: Int, k: Int = 256): Dataset[WindowedSnapshot] = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"windowedQuantiles: quantiles must be in (0, 1], got $ps")
    require(windowMinutes >= 1, "windowedQuantiles: windowMinutes must be >= 1")
    require(numWindows >= 1, "windowedQuantiles: numWindows must be >= 1")
    implicit val outEnc = Encoders.product[WindowedSnapshot]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor(ps, k, windowMinutes * 60_000L, numWindows),
        TimeMode.None(), OutputMode.Update())
  }
}
