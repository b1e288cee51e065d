package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The merges-file deployment seam (COVERAGE.md §2.8): a tiktoken-style
  * rank file round-trips through save → load with the exact same merge
  * table, the reconstructed tokenizer counts identically, and malformed
  * files fail loudly instead of silently changing chunk boundaries.
  */
class BpeSeamSpec extends AnyFunSuite {

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the cat sat on the mat, the cat sat again",
    "pack my box with five dozen liquor jugs — naïve café über 日本語",
    "aaaa bbbb aaaa bbbb aaaa cccc")

  private def trained(numMerges: Int): BpeTokenizer = {
    val counts = corpus.flatMap(Bpe.preTokens)
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
      .toSeq.sortBy(_._1)
    new BpeTokenizer(Bpe.train(counts, numMerges))
  }

  private def writeTemp(lines: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("graft-merges", ".tiktoken")
    java.nio.file.Files.write(f,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    f.toString
  }

  test("rank-file round-trip reconstructs the exact merge table") {
    for (n <- Seq(8, 64, 200)) {
      val tok = trained(n)
      val path = writeTemp(Bpe.mergesToRankLines(tok.merges))
      val loaded = Bpe.loadMerges(path)
      assert(loaded == tok.merges, s"numMerges=$n tables differ")
    }
  }

  test("loaded tokenizer counts and tokens match the original") {
    val tok = trained(100)
    val loaded = new BpeTokenizer(Bpe.loadMerges(
      writeTemp(Bpe.mergesToRankLines(tok.merges))))
    val probes = corpus :+ "unseen zzz «tokens» 42" :+ "" :+ "  \n\t "
    probes.foreach { s =>
      assert(loaded.tokens(s).toSeq == tok.tokens(s).toSeq, s"tokens differ on '$s'")
      assert(loaded.count(s) == tok.count(s), s"count differs on '$s'")
    }
  }

  test("multi-byte UTF-8 symbols survive the base64 round trip") {
    val tok = trained(150)
    // the fixture corpus has é/ü/日 — make sure some merge crosses a
    // multi-byte boundary or at least non-ASCII bytes appear in the table
    assert(tok.merges.exists { case (a, b) => (a + b).exists(_ > 127) },
      "fixture should learn at least one non-ASCII merge")
    val loaded = Bpe.loadMerges(writeTemp(Bpe.mergesToRankLines(tok.merges)))
    assert(loaded == tok.merges)
  }

  test("comment lines are skipped; malformed files throw") {
    val tok = trained(10)
    val withComments = "# cl100k-style header" +: Bpe.mergesToRankLines(tok.merges)
    assert(Bpe.loadMerges(writeTemp(withComments)) == tok.merges)
    intercept[IllegalArgumentException] {
      Bpe.loadMerges(writeTemp(Seq("not a rank line at all")))
    }
    intercept[IllegalArgumentException] {
      Bpe.loadMerges(writeTemp(Seq.empty))
    }
    // single-byte-only table: nothing to reconstruct → loud failure
    intercept[IllegalArgumentException] {
      Bpe.loadMerges(writeTemp(Bpe.mergesToRankLines(IndexedSeq.empty)))
    }
  }

  test("Tokenize.default is the regex approximation when the seam is unset") {
    assume(sys.props.get("graft.bpe.mergesPath").isEmpty &&
      sys.env.get("GRAFT_BPE_MERGES").isEmpty)
    assert(Tokenize.default eq RegexTokenizer)
  }
}
