package graft.services

import graft.core.{RegexTokenizer, TextKeys}
import graft.functions.Hashing

/** Embedding service seam (SURVEY §2.10 E1/E3).
  *
  * The reference calls Azure OpenAI per chunk with retry/backoff
  * (/root/reference/tools/aoai.py:210-264); in Spark the embedder runs
  * batched inside mapPartitions so one task holds one client and one
  * rate-limit window. The default implementation is the deterministic
  * feature-hashing projection (public "hashing trick"): token → murmur
  * bucket ± sign, L2-normalized — hermetic, stable across runs, and shaped
  * exactly like a real embedding call (batch in, vectors out).
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Cap mirrors the reference's 8192-token embedding input limit. */
  def maxTokens: Int = 8192
  def embedBatch(texts: Iterator[String]): Iterator[Array[Float]]
  def embed(text: String): Array[Float] = embedBatch(Iterator(text)).next()
}

final class HashingEmbedder(override val dim: Int = 64) extends Embedder {
  override def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] =
    texts.map { t0 =>
      val t = TextKeys.truncateToTokens(if (t0 == null) "" else t0, maxTokens)
      val acc = new Array[Float](dim)
      val toks = RegexTokenizer.tokens(t.toLowerCase)
      var i = 0
      while (i < toks.length) {
        val h = Hashing.hash64(toks(i))
        val bucket = ((h >>> 1) % dim).toInt
        val sign = if ((h & 1L) == 1L) 1.0f else -1.0f
        acc(bucket) += sign
        i += 1
      }
      var norm = 0.0
      var j = 0
      while (j < dim) { norm += acc(j).toDouble * acc(j); j += 1 }
      val inv = if (norm == 0.0) 0.0f else (1.0 / math.sqrt(norm)).toFloat
      j = 0
      while (j < dim) { acc(j) *= inv; j += 1 }
      acc
    }
}

/** Summarizer/captioner seam (E2) — deterministic first-N-sentences stub so
  * tests and oracles stay hermetic; a real LLM client plugs in unchanged.
  */
trait Summarizer extends Serializable {
  def summarize(text: String): String
}

final class LeadingSentencesSummarizer(nSentences: Int = 3, maxChars: Int = 500)
    extends Summarizer {
  override def summarize(text: String): String = {
    if (text == null) return ""
    val sentences = text.split("(?<=[.!?])\\s+").take(nSentences)
    val s = sentences.mkString(" ")
    if (s.length <= maxChars) s else s.take(maxChars)
  }
}
