package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.config.{CircuitBreakerConfig, RetryConfig}
import graft.core.resilience.{CircuitBreaker, RetryExecutor}

/** Retry invariants, ported from the reference's Hypothesis suite
  * (tests/unit/test_properties.py:134-163).
  */
class RetrySpec extends AnyFunSuite {
  private def forAllSampled[T](gen: Gen[T], n: Int = 100)(body: T => Unit): Unit =
    (0 until n).foreach(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body))

  private val genCfg = for {
    attempts <- Gen.choose(1, 6)
    initial <- Gen.choose(0.0, 10.0)
    maxExtra <- Gen.choose(0.0, 100.0)
    mult <- Gen.choose(1.0, 4.0)
    jitter <- Gen.choose(0.0, 1.0)
  } yield RetryConfig(attempts, initial, initial + maxExtra, mult, jitter)

  test("delay is non-negative and bounded by max·(1+jitter)") {
    forAllSampled(for { c <- genCfg; a <- Gen.choose(0, 10); r <- Gen.choose(0.0, 1.0) } yield (c, a, r)) {
      case (cfg, attempt, rnd) =>
        val d = new RetryExecutor(cfg, _ => (), () => rnd).delayFor(attempt)
        assert(d >= 0.0)
        assert(d <= cfg.maxDelaySeconds * (1 + cfg.jitter) + 1e-9)
    }
  }

  test("deterministic at zero jitter; monotone in attempt") {
    forAllSampled(genCfg.map(_.copy(jitter = 0.0))) { cfg =>
      val ex = new RetryExecutor(cfg, _ => ())
      val ds = (0 to 6).map(ex.delayFor)
      assert(ds == (0 to 6).map(ex.delayFor), "deterministic")
      assert(ds.zip(ds.tail).forall { case (a, b) => b >= a - 1e-12 }, "monotone")
    }
  }

  test("retries up to maxAttempts then rethrows the last failure") {
    var calls = 0
    val ex = new RetryExecutor(RetryConfig(maxAttempts = 3, jitter = 0.0), _ => ())
    val e = intercept[RuntimeException](ex.execute { () =>
      calls += 1
      throw new RuntimeException(s"boom $calls")
    })
    assert(calls == 3)
    assert(e.getMessage == "boom 3")
  }

  test("succeeds after transient failures; onRetry sees attempts") {
    var calls = 0
    val attempts = scala.collection.mutable.ListBuffer[Int]()
    val ex = new RetryExecutor(RetryConfig(maxAttempts = 5, jitter = 0.0), _ => (),
      onRetry = (a, _, _) => attempts += a)
    val r = ex.execute { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(r == 42 && calls == 3 && attempts.toList == List(1, 2))
  }

  test("exception allowlist: simple name, FQCN, and parent-class match") {
    def ex(allow: String*) = new RetryExecutor(
      RetryConfig(retryOnExceptions = allow), _ => ())
    assert(ex("IllegalStateException").shouldRetry(new IllegalStateException))
    assert(ex("java.lang.IllegalStateException").shouldRetry(new IllegalStateException))
    // parent-class match: RuntimeException covers IllegalStateException
    assert(ex("RuntimeException").shouldRetry(new IllegalStateException))
    assert(!ex("java.io.IOException").shouldRetry(new IllegalStateException))
    // empty allowlist = retry on everything
    assert(ex().shouldRetry(new Exception))
  }

  test("non-retryable exception propagates immediately") {
    var calls = 0
    val ex = new RetryExecutor(
      RetryConfig(maxAttempts = 5, retryOnExceptions = Seq("java.io.IOException")),
      _ => ())
    intercept[IllegalStateException](ex.execute { () =>
      calls += 1
      throw new IllegalStateException("fatal")
    })
    assert(calls == 1)
  }
}

/** Circuit-breaker state machine with injected clock (reference
  * property cycle: tests/unit/test_properties.py:171-242).
  */
class CircuitBreakerSpec extends AnyFunSuite {
  private def cbWithClock(cfg: CircuitBreakerConfig): (CircuitBreaker, () => Unit) = {
    var now = 0.0
    val cb = new CircuitBreaker("t", cfg, () => now)
    (cb, () => now += cfg.timeoutSeconds + 0.001)
  }

  test("full cycle CLOSED -> OPEN -> HALF_OPEN -> CLOSED") {
    val cfg = CircuitBreakerConfig(failureThreshold = 3, successThreshold = 2,
      timeoutSeconds = 10.0)
    val (cb, advance) = cbWithClock(cfg)
    import CircuitBreaker._
    assert(cb.currentState == Closed)
    (1 to 2).foreach(_ => cb.recordFailure())
    assert(cb.currentState == Closed)
    cb.recordFailure()
    assert(cb.currentState == Open)
    assert(!cb.allowRequest())
    advance()
    assert(cb.currentState == HalfOpen)
    cb.recordSuccess()
    assert(cb.currentState == HalfOpen)
    cb.recordSuccess()
    assert(cb.currentState == Closed)
  }

  test("half-open failure reopens; half-open call cap enforced") {
    val cfg = CircuitBreakerConfig(failureThreshold = 1, successThreshold = 2,
      timeoutSeconds = 5.0, halfOpenMaxCalls = 1)
    val (cb, advance) = cbWithClock(cfg)
    import CircuitBreaker._
    cb.recordFailure()
    assert(cb.currentState == Open)
    advance()
    assert(cb.allowRequest(), "first half-open probe admitted")
    assert(!cb.allowRequest(), "second concurrent probe rejected")
    cb.recordFailure()
    assert(cb.currentState == Open)
  }

  test("success in CLOSED resets the failure count") {
    val cfg = CircuitBreakerConfig(failureThreshold = 2)
    val (cb, _) = cbWithClock(cfg)
    cb.recordFailure()
    cb.recordSuccess()
    cb.recordFailure()
    assert(cb.currentState == CircuitBreaker.Closed)
  }

  test("call() wraps gate + outcome recording") {
    val cfg = CircuitBreakerConfig(failureThreshold = 1, timeoutSeconds = 1000.0)
    val (cb, _) = cbWithClock(cfg)
    intercept[RuntimeException](cb.call(() => throw new RuntimeException("x")))
    intercept[CircuitBreaker.CircuitOpenError](cb.call(() => 1))
  }

  test("thread safety under concurrent hammering") {
    // reference: tests/unit/test_concurrency.py:29-80 (8 threads × 500)
    val cb = new CircuitBreaker("conc", CircuitBreakerConfig(
      failureThreshold = 5, successThreshold = 2, timeoutSeconds = 0.000001))
    val threads = (1 to 8).map { t =>
      new Thread(() => (1 to 500).foreach { i =>
        cb.allowRequest()
        if ((t + i) % 3 == 0) cb.recordFailure() else cb.recordSuccess()
        cb.currentState
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    // invariant: no deadlock/exception and state is a legal value
    assert(Set[CircuitBreaker.State](CircuitBreaker.Closed, CircuitBreaker.Open,
      CircuitBreaker.HalfOpen).contains(cb.currentState))
  }
}
