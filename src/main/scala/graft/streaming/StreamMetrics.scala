package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.jobs.MetricsSink

/** Streaming observability bridge: a [[StreamingQueryListener]] that
  * forwards per-batch progress into the engine's pluggable
  * [[MetricsSink]] (the same transport seam the batch job lifecycle
  * uses — statsd/OTel on a cluster, in-memory in tests). The
  * continuous sibling of the C2 job counters: a long-running stream
  * has no job end to count, so health IS the per-batch series.
  *
  * Emitted under `{prefix}.{queryName}`:
  *   - `batches` counter — one per completed micro-batch;
  *   - `input_rows` counter — rows ingested (sums across batches);
  *   - `batch_ms` gauge — last batch wall-clock (triggerExecution);
  *   - `state_rows` gauge — total keyed-state rows across stateful
  *     operators (the number that must stay watermark-bounded — an
  *     unbounded climb here is the leak alarm);
  *   - `watermark_lag_ms` gauge — processing-clock distance to the
  *     event-time watermark (staleness alarm);
  *   - `started` / `terminated` / `failed` lifecycle counters.
  *
  * Listener callbacks run on the driver's listener bus — O(1) work
  * per batch, no executor involvement, safe at any scale.
  */
class StreamMetrics(sink: MetricsSink, prefix: String = "graft.streaming")
    extends StreamingQueryListener {

  // terminated events carry only the id — remember the name so the
  // whole lifecycle lands under one metric key
  private val names = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, String]

  private def name(id: java.util.UUID, n: String): String = {
    Option(n).foreach(names.put(id, _))
    s"$prefix.${Option(n).orElse(Option(names.get(id))).getOrElse(id.toString)}"
  }

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit =
    sink.incr(s"${name(event.id, event.name)}.started")

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    val base = name(p.id, p.name)
    sink.incr(s"$base.batches")
    sink.count(s"$base.input_rows", p.numInputRows)
    Option(p.durationMs.get("triggerExecution"))
      .foreach(ms => sink.gauge(s"$base.batch_ms", ms.doubleValue()))
    if (p.stateOperators != null && p.stateOperators.nonEmpty)
      sink.gauge(s"$base.state_rows",
        p.stateOperators.map(_.numRowsTotal).sum.toDouble)
    for {
      em <- Option(p.eventTime)
      wm <- Option(em.get("watermark"))
    } {
      val wmMs = java.time.Instant.parse(wm).toEpochMilli
      if (wmMs > 0) // unset watermarks report the epoch — not a lag
        sink.gauge(s"$base.watermark_lag_ms",
          (System.currentTimeMillis() - wmMs).toDouble)
    }
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    val base = name(event.id, null)
    sink.incr(s"$base.terminated")
    if (event.exception.isDefined) sink.incr(s"$base.failed")
  }
}
