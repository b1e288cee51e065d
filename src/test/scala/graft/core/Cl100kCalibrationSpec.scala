package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Calibration of the corpus-trained BPE against the published cl100k_base
  * tokenizer (SURVEY §7.4; reference counts tokens with tiktoken,
  * tools/aoai.py:266-276). The cl100k merges table is an external artifact
  * this build cannot vendor, so this spec (a) pins the pre-tokenizer rules
  * that ARE exactly reproducible from the published pattern, and (b)
  * MEASURES the count drift on a fixed sample with known cl100k counts —
  * the number recorded in COVERAGE.md. Chunk boundaries at
  * maxTokens=2048 shift proportionally to this drift.
  */
class Cl100kCalibrationSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  /** Fixed samples with their cl100k_base token counts (public tokenizer,
    * reproducible with tiktoken's cl100k_base encoding).
    */
  private val refCounts = Seq(
    "Hello, world!" -> 4,
    "The quick brown fox jumps over the lazy dog." -> 10,
    "the cat sat on the mat" -> 6,
    "1234567890" -> 4,
    "a b c d e" -> 5)

  test("pre-tokenizer rules match the published cl100k pattern structure") {
    // digits group in runs of at most three
    assert(Bpe.preTokens("1234567890") == Seq("123", "456", "789", "0"))
    // contractions split off ('s 'm 'll 've 're 'd 't)
    assert(Bpe.preTokens("I'm") == Seq("I", "'m"))
    assert(Bpe.preTokens("they'll") == Seq("they", "'ll"))
    // words capture their leading space (the " word" convention)
    assert(Bpe.preTokens("a b c") == Seq("a", " b", " c"))
    // punctuation separates from letters
    assert(Bpe.preTokens("world!") == Seq("world", "!"))
  }

  test("measured drift vs cl100k on the fixed sample (recorded in COVERAGE.md)") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
    val tok = Bpe.trainOnCorpus(docs, "text", numMerges = 512)
    val drifts = refCounts.map { case (s, ref) =>
      val ours = tok.count(s)
      // a 512-merge table learned off-domain can only be coarser than the
      // 100k-merge cl100k table — never finer
      assert(ours >= ref, s"'$s': ours $ours < cl100k $ref")
      (s, ours, ref, (ours - ref).toDouble / ref)
    }
    val mean = drifts.map(_._4).sum / drifts.size
    info(f"mean relative drift vs cl100k: +${mean * 100}%.0f%% " +
      drifts.map(d => s"'${d._1.take(16)}…' ${d._2}/${d._3}").mkString("(", ", ", ")"))
    // the drift is real and must stay bounded: a regression past 3x the
    // reference counts would change chunk boundaries out of all proportion
    assert(mean > 0 && mean < 3.0, f"drift $mean%.2f outside the recorded band")

    // chunk-boundary sensitivity: boundaries sit every maxTokens counted
    // tokens, so chunk counts scale ~linearly with the drift. Measure
    // chars-per-token on corpus prose; cl100k's published English rule of
    // thumb is ~4 chars/token.
    val sample = docs.limit(20).collect().map(_.getAs[String]("text")).mkString(" ")
    val charsPerTok = sample.length.toDouble / tok.count(sample)
    val inflation = 4.0 / charsPerTok
    info(f"chars/token ours: $charsPerTok%.2f (cl100k ~4.0) → a 2048-token " +
      f"chunk budget holds ~${inflation}%.2fx more chunks than a cl100k deployment")
    assert(charsPerTok > 1.0 && charsPerTok < 8.0)
  }
}
