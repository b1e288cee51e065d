package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class TextSplittersSpec extends AnyFunSuite {
  private val vocab = Array("spark", "data", "join", "the", "merge", "window",
    "batch", "a", "query", "scan", "sort", "key")
  private def sampleTexts(n: Int): Seq[String] = {
    val rnd = new Random(42)
    (1 to n).map(_ => Seq.fill(rnd.nextInt(200))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
  }
  private val tok = RegexTokenizer

  test("splitKeep concatenation reproduces the input") {
    sampleTexts(50).foreach { t =>
      assert(TextSplitters.splitKeep(t, " ").mkString == t)
    }
    assert(TextSplitters.splitKeep("a\n\nb\n\nc", "\n\n") == Seq("a\n\n", "b\n\n", "c"))
  }

  test("every chunk respects the token budget") {
    val p = SplitParams(maxTokens = 16, overlapTokens = 4, minChunkTokens = 1)
    sampleTexts(50).foreach { t =>
      TextSplitters.recursiveSplit(t, p).foreach { c =>
        assert(tok.count(c) <= p.maxTokens, s"chunk over budget: '$c'")
      }
    }
  }

  test("chunks cover all source tokens in order") {
    val p = SplitParams(maxTokens = 12, overlapTokens = 3, minChunkTokens = 1)
    sampleTexts(50).filter(_.trim.nonEmpty).foreach { t =>
      val chunks = TextSplitters.recursiveSplit(t, p)
      assert(chunks.mkString(" ").split("\\s+").filter(_.nonEmpty).toSet ==
        t.split("\\s+").filter(_.nonEmpty).toSet)
      // order: first token of each chunk appears at nondecreasing positions
      val firstWords = chunks.map(_.trim.split("\\s+").head)
      var pos = 0
      firstWords.foreach { w =>
        val idx = t.indexOf(w, pos)
        assert(idx >= 0)
        pos = idx
      }
    }
  }

  test("consecutive chunks share overlap tokens when overlap > 0") {
    val p = SplitParams(maxTokens = 10, overlapTokens = 4, minChunkTokens = 1)
    val t = (1 to 100).map(i => s"w$i").mkString(" ")
    val chunks = TextSplitters.recursiveSplit(t, p)
    assert(chunks.size > 3)
    chunks.sliding(2).foreach { case Seq(a, b) =>
      val aToks = a.trim.split("\\s+").toSet
      val bHead = b.trim.split("\\s+").head
      assert(aToks.contains(bHead), s"no overlap between '$a' and '$b'")
    case _ =>
    }
  }

  test("min-chunk filter drops short chunks (F6)") {
    val p = SplitParams(maxTokens = 8, overlapTokens = 0, minChunkTokens = 3)
    val out = TextSplitters.splitWithMin("one two three four five six seven eight nine ten", p)
    assert(out.nonEmpty)
    out.foreach(c => assert(tok.count(c) >= 3))
  }

  test("markdown split prefers heading boundaries") {
    val md = "# Title\n\nintro text here\n## Section One\n" +
      ("alpha beta gamma " * 30) + "\n## Section Two\nshort tail"
    val p = SplitParams(maxTokens = 40, overlapTokens = 0, minChunkTokens = 1)
    val chunks = TextSplitters.markdownSplit(md, p)
    assert(chunks.nonEmpty)
    assert(chunks.exists(_.contains("Section Two")))
    chunks.foreach(c => assert(tok.count(c) <= 40))
  }

  test("fixedCharSplit: stride coverage and sizes") {
    val t = "x" * 500
    val chunks = TextSplitters.fixedCharSplit(t, 128, 32)
    assert(chunks.head.length == 128)
    assert(chunks.forall(_.length <= 128))
    assert(chunks.size == (500 - 1) / 96 + 1)
  }
}
