package graft.core.resilience

import graft.core.config.RetryConfig

/** Retry with exponential backoff + jitter (reference:
  * core/resilience/retry.py:19-143).
  *
  * Delay for attempt n (0-based) = min(initial·mult^n, max)·(1+jitter·r)
  * with r uniform in [0,1). Exception filtering matches the reference's
  * name allowlist incl. parent-class matching (retry.py:65-94): a config
  * entry matches if it equals the exception's class name (simple or fully
  * qualified) or the name of any superclass, or if the named class is
  * loadable and `isAssignableFrom` the thrown class.
  *
  * Clock/sleep/random are injectable test seams (the reference injects
  * clock+sleep into its runner for the same reason,
  * runner/simple_runner.py:48-58).
  */
final class RetryExecutor(
    config: RetryConfig,
    sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong),
    random: () => Double = () => scala.util.Random.nextDouble(),
    onRetry: (Int, Throwable, Double) => Unit = (_, _, _) => ()) {

  def delayFor(attempt: Int): Double = {
    val base = math.min(
      config.initialDelaySeconds * math.pow(config.backoffMultiplier, attempt),
      config.maxDelaySeconds)
    base * (1.0 + config.jitter * random())
  }

  def shouldRetry(e: Throwable): Boolean =
    config.retryOnExceptions.isEmpty || config.retryOnExceptions.exists(matches(e, _))

  private def matches(e: Throwable, named: String): Boolean = {
    val simple = named.split('.').last
    var cls: Class[_] = e.getClass
    while (cls != null) {
      if (cls.getName == named || cls.getSimpleName == simple) return true
      cls = cls.getSuperclass
    }
    try Class.forName(named).isAssignableFrom(e.getClass)
    catch { case _: ClassNotFoundException => false }
  }

  /** Run f with up to maxAttempts tries. Non-retryable exceptions
    * propagate immediately; the last failure propagates after exhaustion.
    */
  def execute[T](f: () => T): T = {
    var attempt = 0
    while (true) {
      try return f()
      catch {
        case e: Throwable =>
          if (attempt >= config.maxAttempts - 1 || !shouldRetry(e)) throw e
          val d = delayFor(attempt)
          onRetry(attempt + 1, e, d)
          sleep(d)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
