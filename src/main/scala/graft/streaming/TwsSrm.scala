package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Streaming sample-ratio-mismatch guard — the companion tripwire to
  * the [[TwsMsprt]] experiment monitor: a broken randomizer or a
  * lossy logging path shows up as an arm-count ratio drifting from its
  * design long before any metric readout means anything, and the
  * continuous deployment is a stream that re-reads the chi-square
  * after every micro-batch of assignments, per metric/experiment key.
  *
  * Per-key state is the two arm counts (two longs); the chi-square
  * algebra is the batch operator's own chain
  * ([[graft.operators.Stats.srmChain]] — one implementation, not a
  * copy), so the stream's readout after any prefix EQUALS
  * [[graft.operators.Stats.srmCheck]] on the same rows bit-for-bit
  * (integer counts are order-independent; StreamingSpec pins it with
  * the [[TwsMsprt]] equality pattern). One-armed prefixes emit
  * nothing (the batch operator's both-arms-need-rows gate — silence,
  * not a NaN row). Arm membership is [[TwsMsprt.MetricObs]]'s `armA`
  * flag; the observation's value is ignored (assignment is the event
  * being audited). No timers, no watermark (TimeMode.None): state is
  * two longs per metric, never time-bounded.
  */
object TwsSrm {

  /** One SRM readout per (micro-batch, metric-with-rows). */
  case class SrmSnapshot(metric: String, n_a: Long, n_b: Long,
                         expected_a: Double, expected_b: Double,
                         chi2: Double, srm: Boolean)

  /** PUBLIC on purpose (TwsSessions.scala:37–42 convention): a
    * `private` state case class breaks Spark's encoder codegen and
    * drops every state access to interpreted projection. */
  case class ArmCounts(na: Long, nb: Long)

  private class SrmProcessor(ratioA: Double, threshold: Double)
      extends StatefulProcessor[String, TwsMsprt.MetricObs, SrmSnapshot] {
    @transient private var counts: org.apache.spark.sql.streaming.ValueState[ArmCounts] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getValueState[ArmCounts](
        "counts", Encoders.product[ArmCounts], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TwsMsprt.MetricObs],
                                 timerValues: TimerValues): Iterator[SrmSnapshot] = {
      val st = if (counts.exists()) counts.get() else ArmCounts(0L, 0L)
      var na = st.na; var nb = st.nb
      var absorbed = false
      rows.foreach { o =>
        if (o.armA) na += 1L else nb += 1L
        absorbed = true
      }
      if (!absorbed) Iterator.empty
      else {
        counts.update(ArmCounts(na, nb))
        if (na == 0L || nb == 0L) Iterator.empty
        else {
          val (ea, eb, chi2) = graft.operators.Stats.srmChain(na, nb, ratioA)
          Iterator.single(
            SrmSnapshot(key, na, nb, ea, eb, chi2, chi2 > threshold))
        }
      }
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SrmSnapshot] =
      Iterator.empty // no timers — state is two longs per metric
  }

  /** Continuous SRM monitoring of `obs`, keyed by metric/experiment
    * name. Update-mode output; `ratioA`/`threshold` are the batch
    * operator's parameters (default: 50/50 design, alarm at the
    * standard p < 0.001 chi-square quantile). */
  def monitor(obs: Dataset[TwsMsprt.MetricObs], ratioA: Double = 0.5,
              threshold: Double = 10.827566170662733): Dataset[SrmSnapshot] = {
    require(ratioA > 0.0 && ratioA < 1.0,
      s"TwsSrm: ratioA must be in (0, 1), got $ratioA")
    require(threshold > 0.0, "TwsSrm: threshold must be positive")
    implicit val outEnc = Encoders.product[SrmSnapshot]
    implicit val strEnc = Encoders.STRING
    obs
      .groupByKey(_.metric)
      .transformWithState(new SrmProcessor(ratioA, threshold),
        TimeMode.None(), OutputMode.Update())
  }
}
