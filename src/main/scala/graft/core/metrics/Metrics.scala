package graft.core.metrics

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import scala.jdk.CollectionConverters._

/** Metrics registry (reference: core/metrics/registry.py:18-235):
  * counter/gauge/timer protocol + a thread-safe in-memory implementation.
  * Exporters (Prometheus/OTel in the reference) are adapters over
  * `snapshot`; the text exposition format below matches Prometheus's so
  * an HTTP handler can serve it directly.
  */
trait Counter { def increment(n: Long = 1): Unit; def value: Long }
trait Gauge { def set(v: Double): Unit; def value: Double }
trait Timer { def record(ms: Double): Unit; def count: Long; def totalMs: Double; def maxMs: Double }

trait MeterRegistry {
  def counter(name: String, tags: (String, String)*): Counter
  def gauge(name: String, tags: (String, String)*): Gauge
  def timer(name: String, tags: (String, String)*): Timer
}

final case class MeterId(name: String, tags: Seq[(String, String)])

final class InMemoryMeterRegistry extends MeterRegistry {
  private val counters = new ConcurrentHashMap[MeterId, InMemCounter]()
  private val gauges = new ConcurrentHashMap[MeterId, InMemGauge]()
  private val timers = new ConcurrentHashMap[MeterId, InMemTimer]()

  final class InMemCounter extends Counter {
    private val v = new AtomicLong()
    def increment(n: Long): Unit = v.addAndGet(n)
    def value: Long = v.get()
  }
  final class InMemGauge extends Gauge {
    private val v = new AtomicReference[Double](0.0)
    def set(x: Double): Unit = v.set(x)
    def value: Double = v.get()
  }
  final class InMemTimer extends Timer {
    private val n = new AtomicLong()
    private val total = new java.util.concurrent.atomic.DoubleAdder()
    private val max = new AtomicReference[Double](0.0)
    def record(ms: Double): Unit = {
      n.incrementAndGet(); total.add(ms)
      max.updateAndGet(m => math.max(m, ms))
    }
    def count: Long = n.get()
    def totalMs: Double = total.sum()
    def maxMs: Double = max.get()
  }

  def counter(name: String, tags: (String, String)*): Counter =
    counters.computeIfAbsent(MeterId(name, tags.sortBy(_._1)), _ => new InMemCounter)
  def gauge(name: String, tags: (String, String)*): Gauge =
    gauges.computeIfAbsent(MeterId(name, tags.sortBy(_._1)), _ => new InMemGauge)
  def timer(name: String, tags: (String, String)*): Timer =
    timers.computeIfAbsent(MeterId(name, tags.sortBy(_._1)), _ => new InMemTimer)

  def snapshot: Map[MeterId, Any] =
    (counters.asScala.view.mapValues(_.value: Any) ++
      gauges.asScala.view.mapValues(_.value: Any) ++
      timers.asScala.view.mapValues(t => (t.count, t.totalMs, t.maxMs): Any)).toMap

  /** Prometheus text exposition (core/metrics/exporters.py adapter). */
  def prometheusText: String = {
    def fmt(id: MeterId, v: String) = {
      val n = id.name.replaceAll("[^a-zA-Z0-9_]", "_")
      val t =
        if (id.tags.isEmpty) ""
        else id.tags.map { case (k, x) => s"""$k="$x"""" }.mkString("{", ",", "}")
      s"$n$t $v"
    }
    val lines =
      counters.asScala.toSeq.sortBy(_._1.name).map { case (id, c) => fmt(id, c.value.toString) } ++
        gauges.asScala.toSeq.sortBy(_._1.name).map { case (id, g) => fmt(id, g.value.toString) } ++
        timers.asScala.toSeq.sortBy(_._1.name).flatMap { case (id, t) =>
          Seq(
            fmt(id.copy(name = id.name + "_count"), t.count.toString),
            fmt(id.copy(name = id.name + "_sum"), t.totalMs.toString),
            fmt(id.copy(name = id.name + "_max"), t.maxMs.toString))
        }
    lines.mkString("", "\n", "\n")
  }

  /** OTLP/JSON metrics payload (the OpenTelemetry adapter surface from
    * core/metrics/exporters.py:121-235, expressed as the open OTLP wire
    * schema rather than an SDK dependency — this build is offline).
    * Mapping mirrors the reference: counter → monotonic cumulative Sum,
    * gauge → Gauge, timer → cumulative Histogram in milliseconds
    * (count/sum/max; no buckets, like the reference's summary-style
    * recording). `timeUnixNano` is supplied by the caller so exports are
    * reproducible in tests.
    */
  def otlpJson(timeUnixNano: Long, serviceName: String = "graft"): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def attrs(tags: Seq[(String, String)]) = tags.map { case (k, v) =>
      s"""{"key":"${esc(k)}","value":{"stringValue":"${esc(v)}"}}"""
    }.mkString("[", ",", "]")
    def dp(id: MeterId, valueField: String) =
      s"""{"attributes":${attrs(id.tags)},"timeUnixNano":"$timeUnixNano",$valueField}"""
    val cs = counters.asScala.toSeq.sortBy(_._1.name).map { case (id, c) =>
      s"""{"name":"${esc(id.name)}","sum":{"aggregationTemporality":2,"isMonotonic":true,""" +
        s""""dataPoints":[${dp(id, s""""asInt":"${c.value}"""")}]}}"""
    }
    val gs = gauges.asScala.toSeq.sortBy(_._1.name).map { case (id, g) =>
      s"""{"name":"${esc(id.name)}","gauge":{"dataPoints":[${dp(id, s""""asDouble":${g.value}""")}]}}"""
    }
    val ts = timers.asScala.toSeq.sortBy(_._1.name).map { case (id, t) =>
      s"""{"name":"${esc(id.name)}","unit":"ms","histogram":{"aggregationTemporality":2,""" +
        s""""dataPoints":[${dp(id, s""""count":"${t.count}","sum":${t.totalMs},"max":${t.maxMs}""")}]}}"""
    }
    s"""{"resourceMetrics":[{"resource":{"attributes":[{"key":"service.name",""" +
      s""""value":{"stringValue":"${esc(serviceName)}"}}]},"scopeMetrics":[{""" +
      s""""scope":{"name":"graft.core.metrics"},"metrics":[${(cs ++ gs ++ ts).mkString(",")}]}]}]}"""
  }
}
