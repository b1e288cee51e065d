package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level BPE mechanism (X5): pre-tokenization, merge learning,
  * greedy encoding, losslessness.
  */
class BpeSpec extends AnyFunSuite {

  private val corpus = Seq.fill(50)("the quick brown fox jumps over the lazy dog") ++
    Seq.fill(30)("the quick brown fox") ++
    Seq("zyzzyva qoph")
  private val counts: Map[String, Long] =
    corpus.flatMap(Bpe.preTokens).groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("pre-tokenization: contractions, leading spaces, short digit runs") {
    assert(Bpe.preTokens("I've 1234 gone") == Seq("I", "'ve", " ", "123", "4", " gone"))
    assert(Bpe.preTokens("hello, world!") == Seq("hello", ",", " world", "!"))
    assert(Bpe.preTokens("a\n\nb") == Seq("a", "\n\n", "b"))
  }

  test("training is deterministic and merges the most frequent pairs first") {
    val m1 = Bpe.train(counts.toSeq.sortBy(_._1), 50)
    val m2 = Bpe.train(counts.toSeq.sortBy(_._1).reverse, 50)
    assert(m1 == m2, "merge learning must not depend on input order")
    assert(m1.length >= 30, s"expected a substantive merges table, got ${m1.length}")
    // the very first merge must be a pair from the most frequent word
    assert("the quick".contains(m1.head._1 + m1.head._2))
  }

  test("frequent words collapse to one token; rare words stay subword") {
    // minCount-2 vocab, like trainOnCorpus: rare words contribute no merges
    val tok = new BpeTokenizer(Bpe.train(counts.filter(_._2 >= 2).toSeq, 120))
    assert(tok.encodePreToken(" the").length == 1, "most frequent word must be a single token")
    assert(tok.encodePreToken(" quick").length == 1)
    // seen once: must survive as multiple byte-level subwords
    assert(tok.encodePreToken("zyzzyva").length > 1)
    // never seen at all: falls back to byte symbols, still encodable
    assert(tok.encodePreToken("Ωmega").nonEmpty)
  }

  test("encoding is lossless: token bytes concatenate back to the input") {
    val tok = new BpeTokenizer(Bpe.train(counts.toSeq, 80))
    val inputs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "unseen wörds with ümlauts — and emoji 😀",
      "  leading whitespace\n\nand newlines\t tabs")
    inputs.foreach { s =>
      val bytes = tok.tokens(s).map(_.getBytes("ISO-8859-1")).reduce(_ ++ _)
      assert(new String(bytes, "UTF-8") == s, s"lossy encode of: $s")
    }
  }

  test("token counts follow BPE dynamics: more merges, fewer tokens") {
    val t0 = new BpeTokenizer(IndexedSeq.empty) // pure byte fallback
    val t80 = new BpeTokenizer(Bpe.train(counts.toSeq, 80))
    val s = "the quick brown fox jumps over the lazy dog"
    assert(t0.count(s) == s.getBytes("UTF-8").length)
    assert(t80.count(s) < t0.count(s) / 2, "trained table must compress the training corpus")
    assert(t80.count("") == 0 && t80.count(null) == 0)
  }

  test("spark path: one-scan word counts + driver training") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = corpus.toDF("text")
    val tok = Bpe.trainOnCorpus(df, "text", numMerges = 60)
    // the tiny vocab may exhaust its pairs before 60 merges
    assert(tok.merges.nonEmpty && tok.merges.length <= 60)
    assert(tok.count("the quick brown fox") <= 4)
  }

  test("the trained BPE drives the splitter budget (reference X5→C7 link)") {
    // the reference counts chunk budgets in real BPE tokens; the tokenizer
    // seam makes the trained table a drop-in for the splitter
    val tok = new BpeTokenizer(Bpe.train(counts.filter(_._2 >= 2).toSeq, 120))
    // out-of-vocabulary text: every word decomposes into byte-level
    // subwords, so it genuinely COSTS more budget than its word count —
    // the tiktoken dynamic the regex approximation cannot show
    val text = ("zyzzyva qoph wug snark jabberwock frumious bandersnatch. " * 30).trim
    val p = SplitParams(maxTokens = 16, overlapTokens = 0, minChunkTokens = 1,
      tokenizer = tok)
    val chunks = TextSplitters.recursiveSplit(text, p)
    assert(chunks.nonEmpty)
    chunks.foreach(c => assert(tok.count(c) <= 16, s"over budget in BPE tokens: $c"))
    val regexChunks = TextSplitters.recursiveSplit(text,
      SplitParams(maxTokens = 16, overlapTokens = 0, minChunkTokens = 1))
    assert(chunks.length > regexChunks.length,
      s"unseen words must decompose: bpe=${chunks.length} regex=${regexChunks.length}")
    // while in-vocabulary text costs the same budget either way
    val seen = ("the quick brown fox jumps over the lazy dog. " * 10).trim
    assert(TextSplitters.recursiveSplit(seen, p).length ==
      TextSplitters.recursiveSplit(seen,
        SplitParams(maxTokens = 16, overlapTokens = 0, minChunkTokens = 1)).length)
  }
}
