package graft.core.resilience

import graft.core.config.CircuitBreakerConfig

/** Circuit breaker (reference: core/resilience/circuit_breaker.py:36-224).
  *
  * State machine: CLOSED → OPEN after `failureThreshold` consecutive
  * failures; OPEN → HALF_OPEN after `timeoutSeconds`; HALF_OPEN → CLOSED
  * after `successThreshold` consecutive successes, → OPEN on any failure.
  * HALF_OPEN admits at most `halfOpenMaxCalls` concurrent probes.
  *
  * Thread-safe (the reference hammers it with 8×500-iteration concurrency
  * tests); `clock` is injectable for deterministic tests.
  */
object CircuitBreaker {
  sealed trait State
  case object Closed extends State
  case object Open extends State
  case object HalfOpen extends State

  final case class CircuitOpenError(name: String)
    extends RuntimeException(s"circuit breaker '$name' is OPEN")
}

final class CircuitBreaker(
    val name: String,
    config: CircuitBreakerConfig = CircuitBreakerConfig(),
    clock: () => Double = () => System.nanoTime() / 1e9,
    onStateChange: (CircuitBreaker.State, CircuitBreaker.State) => Unit = (_, _) => ()) {
  import CircuitBreaker._

  private var state: State = Closed
  private var failures = 0
  private var successes = 0
  private var openedAt = 0.0
  private var halfOpenCalls = 0

  def currentState: State = synchronized {
    maybeHalfOpen()
    state
  }

  private def transition(to: State): Unit = {
    val from = state
    if (from != to) {
      state = to
      failures = 0
      successes = 0
      halfOpenCalls = 0
      if (to == Open) openedAt = clock()
      onStateChange(from, to)
    }
  }

  private def maybeHalfOpen(): Unit =
    if (state == Open && clock() - openedAt >= config.timeoutSeconds)
      transition(HalfOpen)

  /** Gate check: true if a call may proceed now (and reserves a half-open
    * probe slot when applicable).
    */
  def allowRequest(): Boolean = synchronized {
    maybeHalfOpen()
    state match {
      case Closed => true
      case Open => false
      case HalfOpen =>
        if (halfOpenCalls < config.halfOpenMaxCalls) { halfOpenCalls += 1; true }
        else false
    }
  }

  def recordSuccess(): Unit = synchronized {
    maybeHalfOpen()
    state match {
      case HalfOpen =>
        successes += 1
        if (successes >= config.successThreshold) transition(Closed)
      case Closed => failures = 0
      case Open => ()
    }
  }

  def recordFailure(): Unit = synchronized {
    maybeHalfOpen()
    state match {
      case HalfOpen => transition(Open)
      case Closed =>
        failures += 1
        if (failures >= config.failureThreshold) transition(Open)
      case Open => ()
    }
  }

  /** Guarded call (circuit_breaker.py:186-219). */
  def call[T](f: () => T): T = {
    if (!allowRequest()) throw CircuitOpenError(name)
    try {
      val r = f()
      recordSuccess()
      r
    } catch {
      case e: Throwable =>
        recordFailure()
        throw e
    }
  }
}
