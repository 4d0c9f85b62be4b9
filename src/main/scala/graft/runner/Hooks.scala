package graft.runner

import graft.core.resilience.CircuitBreaker

/** Lifecycle hook protocol (reference: runner/hooks.py:16-160). All hook
  * invocations made by the runner are error-swallowing — a misbehaving
  * hook can never fail a pipeline (core/utils.py:10-30 safe_call).
  */
trait PipelineHooks {
  def beforePipeline(pipeline: String): Unit = ()
  def afterPipeline(pipeline: String, result: PipelineResult): Unit = ()
  def beforeComponent(component: String): Unit = ()
  def afterComponent(component: String, result: ComponentResult): Unit = ()
  def onComponentFailure(component: String, error: Throwable): Unit = ()
  def onRetryAttempt(component: String, attempt: Int, error: Throwable, delaySeconds: Double): Unit = ()
  def onCircuitBreakerStateChange(component: String, from: CircuitBreaker.State, to: CircuitBreaker.State): Unit = ()
}

object PipelineHooks {
  /** safe_call: run a hook callback, swallow + log any error. */
  def safely(what: String)(f: => Unit): Unit =
    try f
    catch {
      case e: Throwable =>
        org.slf4j.LoggerFactory.getLogger("graft.runner.hooks")
          .warn(s"hook $what failed (ignored): ${e.getMessage}")
    }
}

object NoOpHooks extends PipelineHooks

/** Fan-out to several hooks; each callback is individually
  * error-swallowed (runner/hooks.py Composite).
  */
final class CompositeHooks(hooks: Seq[PipelineHooks]) extends PipelineHooks {
  import PipelineHooks.safely
  override def beforePipeline(p: String): Unit =
    hooks.foreach(h => safely("beforePipeline")(h.beforePipeline(p)))
  override def afterPipeline(p: String, r: PipelineResult): Unit =
    hooks.foreach(h => safely("afterPipeline")(h.afterPipeline(p, r)))
  override def beforeComponent(c: String): Unit =
    hooks.foreach(h => safely("beforeComponent")(h.beforeComponent(c)))
  override def afterComponent(c: String, r: ComponentResult): Unit =
    hooks.foreach(h => safely("afterComponent")(h.afterComponent(c, r)))
  override def onComponentFailure(c: String, e: Throwable): Unit =
    hooks.foreach(h => safely("onComponentFailure")(h.onComponentFailure(c, e)))
  override def onRetryAttempt(c: String, a: Int, e: Throwable, d: Double): Unit =
    hooks.foreach(h => safely("onRetryAttempt")(h.onRetryAttempt(c, a, e, d)))
  override def onCircuitBreakerStateChange(c: String, f: CircuitBreaker.State, t: CircuitBreaker.State): Unit =
    hooks.foreach(h => safely("onCircuitBreakerStateChange")(h.onCircuitBreakerStateChange(c, f, t)))
}

/** Logging hooks (runner/hooks_builtin.py:16-80). */
final class LoggingHooks extends PipelineHooks {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.pipeline")
  override def beforePipeline(p: String): Unit = log.info(s"pipeline $p: starting")
  override def afterPipeline(p: String, r: PipelineResult): Unit =
    log.info(s"pipeline $p: ${r.status} in ${r.totalDurationMs}ms " +
      s"(${r.succeeded.size} ok, ${r.failed.size} failed, ${r.skipped.size} skipped)")
  override def beforeComponent(c: String): Unit = log.info(s"component $c: starting")
  override def afterComponent(c: String, r: ComponentResult): Unit =
    log.info(s"component $c: ${r.status} in ${r.durationMs}ms" +
      (if (r.retries > 0) s" after ${r.retries} retries" else ""))
  override def onComponentFailure(c: String, e: Throwable): Unit =
    log.error(s"component $c: FAILED: ${e.getMessage}")
  override def onRetryAttempt(c: String, a: Int, e: Throwable, d: Double): Unit =
    log.warn(f"component $c: retry #$a after ${e.getMessage} (waiting $d%.2fs)")
  override def onCircuitBreakerStateChange(c: String, f: CircuitBreaker.State, t: CircuitBreaker.State): Unit =
    log.warn(s"component $c: circuit breaker $f -> $t")
}

/** Metrics hooks recording counters/timers into a MeterRegistry
  * (runner/hooks_builtin.py:146-200).
  */
final class MetricsHooks(registry: graft.core.metrics.MeterRegistry) extends PipelineHooks {
  override def afterPipeline(p: String, r: PipelineResult): Unit = {
    registry.counter("pipeline.runs", "pipeline" -> p, "status" -> r.status.toString).increment()
    registry.timer("pipeline.duration_ms", "pipeline" -> p).record(r.totalDurationMs.toDouble)
  }
  override def afterComponent(c: String, r: ComponentResult): Unit = {
    registry.counter("component.runs", "component" -> c, "status" -> r.status.toString).increment()
    registry.timer("component.duration_ms", "component" -> c).record(r.durationMs.toDouble)
    if (r.retries > 0)
      registry.counter("component.retries", "component" -> c).increment(r.retries)
  }
  override def onComponentFailure(c: String, e: Throwable): Unit =
    registry.counter("component.failures", "component" -> c).increment()
}
