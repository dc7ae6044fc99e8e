package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.functions.{BootstrapWeights, KllBuffer}

/** Streaming per-segment QUANTILE treatment effects — the last batch
  * readout without a `transformWithState` twin (round-17 verdict item
  * 4): [[graft.operators.Stats.bootstrapQuantileDiffBySegment]] — "did
  * p50/p90 move, and in WHICH segment" — re-read after every
  * micro-batch of observations, per metric key. A ramp watching p95
  * latency by segment live now has a monitor, completing the tier:
  * means×segments ([[TwsWelchSegments]]), quantiles×overall
  * ([[TwsQuantiles]]/[[TwsWindowedQuantiles]]), quantiles×segments —
  * this.
  *
  * Per-key state is one weighted KLL sketch per (segment, resample
  * j ∈ 0..B, arm) cell — the SAME [[KllBuffer]] kernel the batch
  * aggregate shuffles, one [[MapState]] row per cell (a hot cell never
  * rewrites its siblings; the [[TwsWindowedQuantiles]] layout), ≤
  * `maxSegments`·2·(B+1) rows bounded via the O(1) segment counter.
  * The resample weights are the batch's own key-derived
  * [[BootstrapWeights]] draws (index 0 = the identity sample), so the
  * stream needs NO randomness and absorbs each row exactly as the
  * batch explode does. The readout algebra is the batch operator's own
  * chain ([[graft.operators.Stats.quantileSegmentsChain]] — factored
  * so batch and stream run ONE implementation: the
  * bootstrapQuantileDiffCI driver algebra per segment, percentile-
  * bootstrap sign p, the shared bhThreshold step-up across segments
  * within each quantile level).
  *
  * EXACTNESS/EQUALITY: weighted binary-decomposition inserts commute
  * and merges concatenate, so while every sketch level stays under `k`
  * (the exact regime — [[graft.functions.QuantileSketch]]'s contract)
  * the per-cell quantile reads are the exact weighted order statistics
  * regardless of arrival order, and the stream's snapshot after any
  * prefix EQUALS the batch operator on the same rows bit-for-bit
  * (StreamingSpec pins it). Beyond the exact regime both sides carry
  * the same ≈1/k rank-error contract but identical results are no
  * longer guaranteed — size `k` to the horizon, exactly as the batch
  * query does.
  *
  * PRECONDITION (the batch's uniqueKeyedFanout contract, restated for
  * a stream): `key` must uniquely identify an observation ACROSS THE
  * WHOLE STREAM — the weights derive from the key alone, so a re-sent
  * key silently double-counts its row in every resample. Degenerate
  * prefixes — a one-armed or thin segment, under 10 live resamples —
  * emit NOTHING (the chain's Left states: the batch fails loud because
  * a silent drop would hide the slice; a stream mid-fill treats the
  * same state as not-yet-defined). Non-finite values and NULL segments
  * are skipped (the batch finite()/isNotNull gate).
  */
object TwsQuantileSegments {

  /** One observation: metric, segment label, the UNIQUE row key the
    * bootstrap weights derive from, value, arm (`armA = true` ⇔ the
    * batch `sampleACond` holds). */
  case class QSegObs(metric: String, segment: String, key: Long,
                     value: Double, armA: Boolean)

  /** One (segment, quantile level) readout per absorbing micro-batch —
    * the batch operator's row with the metric key in front. */
  case class QSegSnapshot(metric: String, grp: String, p: Double,
                          b_eff: Long, n_a: Long, n_b: Long, diff: Double,
                          ci_lo: Double, ci_hi: Double, p_boot: Double,
                          significant: Boolean)

  // cell key: "<j>:<arm>:<segment>" — j and arm are fixed-format
  // numeric prefixes parsed from the left, so a segment containing ':'
  // cannot alias another cell
  private def cellKey(j: Int, armA: Boolean, seg: String): String =
    s"$j:${if (armA) 1 else 0}:$seg"

  private def parseCell(ck: String): (String, Int, Long) = {
    val c1 = ck.indexOf(':')
    val c2 = ck.indexOf(':', c1 + 1)
    (ck.substring(c2 + 1), ck.substring(0, c1).toInt,
      ck.substring(c1 + 1, c2).toLong)
  }

  private class Processor(ps: Seq[Double], b: Int, alpha: Double,
                          q: Double, k: Int, maxSegments: Int)
      extends StatefulProcessor[String, QSegObs, QSegSnapshot] {
    @transient private var cells: MapState[String, Array[Byte]] = _
    @transient private var segs: MapState[String, Long] = _
    @transient private var nSegs:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    @transient private lazy val seeds: Array[Long] =
      BootstrapWeights.seedsFor(b)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cells = getHandle.getMapState[String, Array[Byte]](
        "cells", Encoders.STRING, Encoders.BINARY, TTLConfig.NONE)
      segs = getHandle.getMapState[String, Long](
        "segs", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      nSegs = getHandle.getValueState[Long](
        "nSegs", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[QSegObs],
                                 timerValues: TimerValues): Iterator[QSegSnapshot] = {
      var absorbed = false
      // buffer touched cells so a cell's state row is deserialized and
      // serialized once per batch, not once per (row, resample)
      val touched = scala.collection.mutable.Map.empty[String, KllBuffer]
      rows.foreach { o =>
        // non-finite values and NULL segments skip (the batch gate)
        if (java.lang.Double.isFinite(o.value) && o.segment != null) {
          if (!segs.containsKey(o.segment)) {
            // a NEW segment: bound the per-key state BEFORE growing it
            val kc = if (nSegs.exists()) nSegs.get() else 0L
            require(kc < maxSegments,
              s"TwsQuantileSegments: metric '$key' exceeded maxSegments=" +
                s"$maxSegments — an unbounded segment key grows " +
                "2(B+1) sketches per value; coarsen the segment key")
            segs.updateValue(o.segment, 1L)
            nSegs.update(kc + 1L)
          }
          val ws = BootstrapWeights.compute(o.key, seeds)
          var j = 0
          while (j <= b) {
            val w = ws.getInt(j)
            if (w > 0) {
              val ck = cellKey(j, o.armA, o.segment)
              val buf = touched.getOrElseUpdate(ck,
                if (cells.containsKey(ck)) KllBuffer.fromBytes(cells.getValue(ck))
                else new KllBuffer(k))
              buf.addWeighted(o.value, w.toLong)
            }
            j += 1
          }
          absorbed = true
        }
      }
      if (!absorbed) Iterator.empty
      else {
        touched.foreach { case (ck, buf) =>
          cells.updateValue(ck, KllBuffer.toBytes(buf)) }
        // snapshot: every cell's quantile read + weighted count into
        // the batch operator's own chain
        val byCell = cells.iterator().map { case (ck, bytes) =>
          val (seg, j, arm) = parseCell(ck)
          val buf = KllBuffer.fromBytes(bytes)
          (seg, j, arm) -> ((buf.quantiles(ps).toSeq, buf.count))
        }.toMap
        graft.operators.Stats.quantileSegmentsChain(byCell, ps, b, alpha, q) match {
          case Left(_) => Iterator.empty // undefined mid-fill: silence
          case Right(out) => out.iterator.map {
            case (g, p, bEff, na, nb, diff, lo, hi, pb, sig) =>
              QSegSnapshot(key, g, p, bEff, na, nb, diff, lo, hi, pb, sig)
          }
        }
      }
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[QSegSnapshot] =
      Iterator.empty // no timers — state is O(|segments|·B) per metric
  }

  /** Continuous per-segment quantile-effect monitoring of `obs`, keyed
    * by metric name. Update-mode output (BH is recomputed over ALL
    * segments each absorbing batch, so a slice can correctly lose
    * significance as others accumulate evidence); `ps`/`b`/`alpha`/
    * `q`/`k` are the batch operator's parameters, `maxSegments` bounds
    * per-key state. */
  def monitor(obs: Dataset[QSegObs], ps: Seq[Double] = Seq(0.5, 0.9),
              b: Int = 200, alpha: Double = 0.05, q: Double = 0.05,
              k: Int = 256, maxSegments: Int = 64): Dataset[QSegSnapshot] = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"TwsQuantileSegments: quantiles must be in (0, 1], got $ps")
    require(alpha > 0.0 && alpha < 1.0,
      s"TwsQuantileSegments: alpha must be in (0, 1), got $alpha")
    require(q > 0.0 && q < 1.0,
      s"TwsQuantileSegments: q must be in (0, 1), got $q")
    require(b >= 10 && b <= 10_000,
      s"TwsQuantileSegments: resamples must be in [10, 10000], got $b")
    require(k >= 8,
      s"TwsQuantileSegments: sketch k must be >= 8, got $k")
    require(maxSegments >= 1,
      s"TwsQuantileSegments: maxSegments must be positive, got $maxSegments")
    implicit val outEnc = Encoders.product[QSegSnapshot]
    implicit val strEnc = Encoders.STRING
    obs
      .groupByKey(_.metric)
      .transformWithState(new Processor(ps, b, alpha, q, k, maxSegments),
        TimeMode.None(), OutputMode.Update())
  }
}
