package graft.jobs

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Pluggable job-metrics sink (SURVEY §2.A row C2): the reference
  * emits statsd `success` / `fail` counters under the prefix
  * `amundsen.databuilder.job.{identifier}` when
  * `job.is_statsd_enabled` is set (customized_job.py:39-44,83-89).
  * The engine keeps the same metric names and gating but makes the
  * transport a trait — a cluster deployment wraps its statsd/OTel
  * client; tests use [[MetricsSink.InMemory]]; the default is Noop so
  * metrics never affect job semantics.
  */
trait MetricsSink extends Serializable {
  def incr(metric: String): Unit

  /** Counter add (statsd `count`). ABSTRACT on purpose: the obvious
    * default (n repeated incrs) is O(n), and [[graft.streaming.StreamMetrics]]
    * passes per-micro-batch row counts (can be millions) on the shared
    * driver listener-bus thread — a looping default would stall every
    * streaming listener. Real statsd/OTel clients all have a native
    * add-n; implement it in O(1). */
  def count(metric: String, n: Long): Unit

  /** Point-in-time gauge (statsd `gauge`). Default: dropped — a
    * counter-only transport has no meaningful gauge semantics. */
  def gauge(metric: String, value: Double): Unit = ()
}

object MetricsSink {

  /** Disabled metrics (the reference's statsd=None path). */
  object Noop extends MetricsSink {
    override def incr(metric: String): Unit = ()
    override def count(metric: String, n: Long): Unit = ()
  }

  /** Thread-safe in-memory counters + last-value gauges for tests and
    * dry runs. */
  final class InMemory extends MetricsSink {
    private val counters = new ConcurrentHashMap[String, AtomicLong]
    private val gauges = new ConcurrentHashMap[String, java.lang.Double]
    override def incr(metric: String): Unit =
      counters.computeIfAbsent(metric, _ => new AtomicLong).incrementAndGet()
    override def count(metric: String, n: Long): Unit =
      counters.computeIfAbsent(metric, _ => new AtomicLong).addAndGet(n)
    override def gauge(metric: String, value: Double): Unit =
      gauges.put(metric, value)
    def value(metric: String): Long =
      Option(counters.get(metric)).map(_.get()).getOrElse(0L)
    def gaugeValue(metric: String): Option[Double] =
      Option(gauges.get(metric)).map(_.doubleValue())
    def all: Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      counters.asScala.map { case (k, v) => k -> v.get() }.toMap
    }
  }
}
