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
}

object MetricsSink {

  /** Disabled metrics (the reference's statsd=None path). */
  object Noop extends MetricsSink {
    override def incr(metric: String): Unit = ()
  }

  /** Thread-safe in-memory counters for tests and dry runs. */
  final class InMemory extends MetricsSink {
    private val counters = new ConcurrentHashMap[String, AtomicLong]
    override def incr(metric: String): Unit =
      counters.computeIfAbsent(metric, _ => new AtomicLong).incrementAndGet()
    def value(metric: String): Long =
      Option(counters.get(metric)).map(_.get()).getOrElse(0L)
    def all: Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      counters.asScala.map { case (k, v) => k -> v.get() }.toMap
    }
  }
}
