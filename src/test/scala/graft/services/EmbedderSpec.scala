package graft.services

import org.scalatest.funsuite.AnyFunSuite

class EmbedderSpec extends AnyFunSuite {
  private val emb = new HashingEmbedder(64)

  test("deterministic, unit-norm, right dimension (E1)") {
    val v1 = emb.embed("spark shuffles data across the cluster")
    val v2 = emb.embed("spark shuffles data across the cluster")
    assert(v1.length == 64)
    assert(v1.sameElements(v2))
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("different texts differ; empty text is the zero vector") {
    val a = emb.embed("alpha beta gamma")
    val b = emb.embed("delta epsilon zeta")
    assert(!a.sameElements(b))
    assert(emb.embed("").forall(_ == 0.0f))
    assert(emb.embed(null).forall(_ == 0.0f))
  }

  test("batch preserves order and count (E3 batching shape)") {
    val texts = (1 to 100).map(i => s"document number $i")
    val out = emb.embedBatch(texts.iterator).toSeq
    assert(out.size == 100)
    assert(out(7).sameElements(emb.embed("document number 8")))
  }

  test("summarizer stub is deterministic (E2)") {
    val s = new LeadingSentencesSummarizer(2)
    val text = "First sentence. Second one! Third here? Fourth."
    assert(s.summarize(text) == "First sentence. Second one!")
    assert(s.summarize(text) == s.summarize(text))
  }
}
