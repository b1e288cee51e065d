package graft.services

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  private def policy = RetryPolicy(maxAttempts = 5, baseDelayMs = 100,
    maxDelayMs = 1000, jitterMs = 0)

  test("succeeds after transient failures; delays grow exponentially and cap") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val out = Retry.withRetry(policy, sleeps += _) { () =>
      calls += 1
      if (calls < 4) throw new RetryableException(s"transient $calls")
      "ok"
    }
    assert(out == "ok")
    assert(calls == 4)
    assert(sleeps.toSeq == Seq(100L, 200L, 400L))
  }

  test("Retry-After overrides the computed backoff, clamped to the policy envelope") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    Retry.withRetry(policy, sleeps += _) { () =>
      calls += 1
      if (calls == 1) throw new RetryableException("throttled", retryAfterMs = Some(345L))
      if (calls == 2) throw new RetryableException("throttled", retryAfterMs = Some(999999L))
      if (calls == 3) throw new RetryableException("garbage", retryAfterMs = Some(-7L))
      "ok"
    }
    // honored below the cap; huge values clamp to maxDelayMs; negative → 0
    assert(sleeps.toSeq == Seq(345L, 1000L, 0L))
  }

  test("gives up after maxAttempts with the last error; non-retryable passes through") {
    var calls = 0
    val e = intercept[RetryableException] {
      Retry.withRetry(policy, _ => ()) { () =>
        calls += 1
        throw new RetryableException(s"always $calls")
      }
    }
    assert(calls == 5)
    assert(e.getMessage == "always 5")
    intercept[IllegalArgumentException] {
      Retry.withRetry(policy, _ => ())(() => throw new IllegalArgumentException("fatal"))
    }
  }

  test("delay is capped at maxDelayMs and jitter is deterministic") {
    val p = RetryPolicy(maxAttempts = 30, baseDelayMs = 100, maxDelayMs = 1000, jitterMs = 500)
    val d10 = Retry.delayFor(p, 10, None)
    assert(d10 >= 1000 && d10 < 1500)
    assert(d10 == Retry.delayFor(p, 10, None))
    // huge attempt numbers must not overflow the shift
    assert(Retry.delayFor(p, 29, None) >= 1000)
  }

  test("RetryingEmbedder replays the same batch and stays deterministic") {
    val inner = new HashingEmbedder(16)
    var failures = 2
    val flaky = new Embedder {
      override def dim: Int = inner.dim
      override def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = {
        val batch = texts.toSeq
        if (failures > 0) { failures -= 1; throw new RetryableException("blip") }
        inner.embedBatch(batch.iterator)
      }
    }
    val retrying = new RetryingEmbedder(flaky, policy, _ => ())
    val out = retrying.embedBatch(Iterator("alpha beta", "gamma")).toSeq
    assert(failures == 0)
    assert(out.map(_.toSeq) == inner.embedBatch(Iterator("alpha beta", "gamma")).toSeq.map(_.toSeq))
  }
}
