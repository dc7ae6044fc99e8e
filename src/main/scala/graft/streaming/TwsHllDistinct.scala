package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.HllRegister
import graft.operators.Hll

/** Streaming APPROXIMATE distinct counts on HyperLogLog-register state
  * — the sketch-as-`transformWithState`-state pattern
  * ([[TwsQuantiles]] for quantiles) applied to cardinality:
  *
  *   - [[TwsRollingDistinct]] is EXACT but keeps one RocksDB row per
  *     (key, value) alive in the horizon — the right trade while the
  *     per-key distinct set is small (event types: dozens). For
  *     high-cardinality values ("distinct items/session ids/documents
  *     this user ever touched") that state is the corpus again;
  *   - this processor keeps a FIXED 2^p-byte register array per key
  *     (512 B at the default p = 9) at ANY cardinality, all-history,
  *     no watermark (TimeMode.None — size-bounded by construction,
  *     the [[TwsQuantiles]] argument), ±~1.04/√m relative error.
  *
  * The register math is byte-for-byte the BATCH operator's
  * ([[graft.operators.Hll]]): the same splitmix64 bucket/rho
  * coordinates ([[HllRegister.compute]]) and the same
  * alpha·m²/Σ2^-rho estimate with the linear-counting small-range
  * branch — so a streaming snapshot is EXACTLY the number the batch
  * query would report on the same prefix of the stream
  * (StreamingSpec pins the equality), and the registers themselves
  * could be exported and merged into the batch register tables
  * (union + re-max) without translation.
  */
object TwsHllDistinct {

  /** One per-key snapshot per micro-batch that touched the key:
    * `n_events` = rows absorbed so far (exact), `est_distinct` = the
    * HLL estimate of distinct `idOf` values, all-history. */
  case class DistinctEstimate(key: Long, n_events: Long, est_distinct: Double)

  /** Batch-identical estimate from a register array (rho per bucket,
    * 0 = never hit): alpha·m²·2^(65-p) / Σ 2^(65-p-rho) with the
    * missing-register term, linear counting when raw ≤ 2.5m with empty
    * registers — [[Hll.estimate]]'s arithmetic on one array, rounded
    * to the same 4 decimals. */
  private[streaming] def estimate(regs: Array[Byte], p: Int): Double = {
    val m = 1 << p
    // EXACT integer register sum (the batch path sums DecimalType(38,0)
    // then casts once — a double accumulation would drop low bits when
    // the 2^(65-p-rho) terms span > 53 bits and break the spec's
    // streaming == batch equality in the 4th decimal)
    var denom = java.math.BigInteger.ZERO
    var zeros = 0
    var i = 0
    while (i < m) {
      val rho = regs(i).toInt
      if (rho == 0) zeros += 1
      denom = denom.add(java.math.BigInteger.ONE.shiftLeft(65 - p - rho))
      i += 1
    }
    val raw = Hll.numerator(p) / new java.math.BigDecimal(denom).doubleValue()
    val est =
      if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
      else raw
    BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private[streaming] def absorb(regs: Array[Byte], id: Long, p: Int): Unit = {
    val c = HllRegister.compute(id, p)
    val bucket = c.getInt(0)
    val rho = c.getInt(1)
    if (rho > regs(bucket)) regs(bucket) = rho.toByte
  }

  private class Processor(p: Int, idOf: StatefulSessions.Event => Long)
      extends StatefulProcessor[Long, StatefulSessions.Event, DistinctEstimate] {
    @transient private var regs: ValueState[Array[Byte]] = _
    @transient private var nEvents: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      regs = getHandle.getValueState[Array[Byte]](
        "regs", Encoders.BINARY, TTLConfig.NONE)
      nEvents = getHandle.getValueState[Long](
        "nEvents", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
                                 rows: Iterator[StatefulSessions.Event],
                                 timerValues: TimerValues): Iterator[DistinctEstimate] = {
      val r = if (regs.exists()) regs.get() else new Array[Byte](1 << p)
      var n = if (nEvents.exists()) nEvents.get() else 0L
      var absorbed = false
      rows.foreach { e =>
        absorb(r, idOf(e), p)
        n += 1L
        absorbed = true
      }
      if (!absorbed) Iterator.empty
      else {
        regs.update(r)
        nEvents.update(n)
        Iterator.single(DistinctEstimate(key, n, estimate(r, p)))
      }
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[DistinctEstimate] =
      Iterator.empty // no timers — state is size-bounded, not time-bounded
  }

  /** All-history approximate distinct `idOf` values per user; update
    * mode (a key's snapshot supersedes its previous one). */
  def distinctIds(events: Dataset[StatefulSessions.Event], p: Int = 9,
                  idOf: StatefulSessions.Event => Long = _.event_id)
      : Dataset[DistinctEstimate] = {
    require(p >= 4 && p <= 16, s"distinctIds: hll precision p=$p outside [4, 16]")
    implicit val outEnc = Encoders.product[DistinctEstimate]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor(p, idOf),
        TimeMode.None(), OutputMode.Update())
  }

  // ---- bounded-horizon sibling: per-window register ring -----------

  /** `window_start_ms` = the key's newest populated window; `n` =
    * events inside the horizon (exact); `est_distinct` = HLL estimate
    * over the horizon's merged registers. */
  case class WindowedDistinct(key: Long, window_start_ms: Long, n: Long,
                              est_distinct: Double)

  /** Per-(key, window) register rows merged on read — the
    * [[TwsWindowedQuantiles]] ring with HLL instead of KLL: "distinct
    * items in the last N tumbling windows", live. Register merge is
    * byte-wise max (HLL's lossless union), so a window rolling off
    * subtracts its UNIQUE contribution exactly — the thing a single
    * decaying sketch cannot do. Eviction keys off the key's own event
    * time ([[TwsWindowedQuantiles]]'s quiet-key argument); the window
    * count n rides each window's register blob as an 8-byte prefix so
    * the ring stays ONE state row per (key, window). */
  private class WindowedProcessor(p: Int, windowMs: Long, numWindows: Int,
                                  idOf: StatefulSessions.Event => Long)
      extends StatefulProcessor[Long, StatefulSessions.Event, WindowedDistinct] {
    @transient private var wins: MapState[Long, Array[Byte]] = _
    private val m = 1 << p

    private def count(blob: Array[Byte]): Long =
      java.nio.ByteBuffer.wrap(blob, 0, 8).getLong
    private def setCount(blob: Array[Byte], n: Long): Unit =
      java.nio.ByteBuffer.wrap(blob, 0, 8).putLong(n)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      wins = getHandle.getMapState[Long, Array[Byte]](
        "wins", Encoders.scalaLong, Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long,
                                 rows: Iterator[StatefulSessions.Event],
                                 timerValues: TimerValues): Iterator[WindowedDistinct] = {
      val touched = scala.collection.mutable.Map.empty[Long, Array[Byte]]
      rows.foreach { e =>
        val w = Math.floorDiv(e.ts.getTime, windowMs) * windowMs
        val blob = touched.getOrElseUpdate(w,
          if (wins.containsKey(w)) wins.getValue(w) else new Array[Byte](8 + m))
        var i = 0
        val c = HllRegister.compute(idOf(e), p)
        i = 8 + c.getInt(0)
        val rho = c.getInt(1)
        if (rho > blob(i)) blob(i) = rho.toByte
        setCount(blob, count(blob) + 1L)
      }
      if (touched.isEmpty) return Iterator.empty
      touched.foreach { case (w, blob) => wins.updateValue(w, blob) }
      var newest = Long.MinValue
      val starts = Seq.newBuilder[Long]
      wins.keys().foreach { w => newest = math.max(newest, w); starts += w }
      val floor = newest - (numWindows - 1).toLong * windowMs
      val (dead, live) = starts.result().partition(_ < floor)
      dead.foreach(wins.removeKey)
      val merged = new Array[Byte](m)
      var n = 0L
      live.foreach { w =>
        val blob = wins.getValue(w)
        n += count(blob)
        var i = 0
        while (i < m) {
          if (blob(8 + i) > merged(i)) merged(i) = blob(8 + i)
          i += 1
        }
      }
      Iterator.single(WindowedDistinct(key, newest, n, estimate(merged, p)))
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[WindowedDistinct] =
      Iterator.empty
  }

  /** Approximate distinct `idOf` values over the last `numWindows`
    * tumbling windows of `windowMinutes`, per user; update mode. */
  def windowedDistinctIds(events: Dataset[StatefulSessions.Event],
                          windowMinutes: Int, numWindows: Int, p: Int = 9,
                          idOf: StatefulSessions.Event => Long = _.event_id)
      : Dataset[WindowedDistinct] = {
    require(p >= 4 && p <= 16,
      s"windowedDistinctIds: hll precision p=$p outside [4, 16]")
    require(windowMinutes >= 1, "windowedDistinctIds: windowMinutes must be >= 1")
    require(numWindows >= 1, "windowedDistinctIds: numWindows must be >= 1")
    implicit val outEnc = Encoders.product[WindowedDistinct]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new WindowedProcessor(p, windowMinutes * 60_000L, numWindows, idOf),
        TimeMode.None(), OutputMode.Update())
  }
}
