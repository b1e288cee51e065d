package graft.services

/** Bounded exponential-backoff retry for external service calls
  * (SURVEY §4 "Retry/backoff — custom utility inside service traits").
  *
  * Mirrors the reference's policy envelope
  * (/root/reference/tools/aoai.py:43-46, 85-131): up to `maxAttempts`
  * attempts, delay doubling from `baseDelayMs` capped at `maxDelayMs`,
  * plus bounded jitter, with a server-provided Retry-After overriding the
  * computed delay. Jitter is derived deterministically from the attempt
  * number so behavior is reproducible in tests and across task retries.
  *
  * Runs inside executor tasks (one policy instance per service client per
  * task); Spark's own task retry remains the outer safety net.
  */
final case class RetryPolicy(
    maxAttempts: Int = 20,
    baseDelayMs: Long = 1000,
    maxDelayMs: Long = 60000,
    jitterMs: Long = 500,
    /** Fixed jitter seed for reproducible tests; None (production) mixes a
      * per-call random nonce so concurrent clients desynchronize instead of
      * retrying in lock-step.
      */
    jitterSeed: Option[Long] = None)

/** Failure that the service reports as transient; `retryAfterMs` carries a
  * server-specified wait (the Retry-After / retry-after-ms header analog).
  */
final class RetryableException(msg: String, val retryAfterMs: Option[Long] = None,
    cause: Throwable = null) extends RuntimeException(msg, cause)

object Retry {

  /** Jitter in [0, jitterMs) from (seed, attempt) — deterministic for a
    * fixed seed, desynchronized across clients for random seeds.
    */
  private def jitter(policy: RetryPolicy, seed: Long, attempt: Int): Long =
    if (policy.jitterMs <= 0) 0L
    else java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.caseClassHash((seed, attempt)).toLong, policy.jitterMs)

  /** Exponential delay for the given 1-based attempt, capped and jittered.
    * A server-provided Retry-After wins but is clamped to [0, maxDelayMs] —
    * a garbage negative header must not crash the sleeper and a huge one
    * must not stall the task beyond the policy envelope.
    */
  def delayFor(policy: RetryPolicy, attempt: Int, retryAfterMs: Option[Long],
      seed: Long = 0L): Long =
    retryAfterMs match {
      case Some(ra) => math.min(policy.maxDelayMs, math.max(0L, ra))
      case None =>
        val exp = policy.baseDelayMs * (1L << math.min(20, attempt - 1))
        math.min(policy.maxDelayMs, exp) + jitter(policy, seed, attempt)
    }

  /** Run `op` with retries on [[RetryableException]]; other exceptions
    * propagate immediately. `sleeper` is injectable for tests.
    */
  def withRetry[T](policy: RetryPolicy, sleeper: Long => Unit = Thread.sleep)(op: () => T): T = {
    val seed = policy.jitterSeed.getOrElse(
      java.util.concurrent.ThreadLocalRandom.current().nextLong())
    var attempt = 0
    while (true) {
      attempt += 1
      try return op()
      catch {
        case e: RetryableException =>
          if (attempt >= policy.maxAttempts) throw e
          sleeper(delayFor(policy, attempt, e.retryAfterMs, seed))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Embedder decorator adding the retry envelope around each batch call —
  * the composition a real remote client uses: batching from
  * [[graft.pipeline.ChunkIndexer.embedChunks]], retry here, determinism
  * from the inner embedder.
  */
final class RetryingEmbedder(inner: Embedder, policy: RetryPolicy = RetryPolicy(),
    sleeper: Long => Unit = Thread.sleep) extends Embedder {
  override def dim: Int = inner.dim
  override def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = {
    // materialize the batch so a retry can replay it
    val batch = texts.toSeq
    Retry.withRetry(policy, sleeper)(() => inner.embedBatch(batch.iterator).toSeq).iterator
  }
}
