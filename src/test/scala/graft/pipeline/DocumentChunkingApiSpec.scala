package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{RegexTokenizer, SplitParams, TextKeys}

class DocumentChunkingApiSpec extends AnyFunSuite {
  import DocumentChunkingApi._

  private val p = SplitParams(maxTokens = 32, overlapTokens = 4, minChunkTokens = 2)

  test("happy path: chunks with stable keys, title, token counts, vectors") {
    val text = ("alpha beta gamma delta epsilon. " * 20).trim
    val r = chunkDocument(text.getBytes("UTF-8"),
      "https://store/container/annual_report-2026.txt", "txt", p)
    assert(r.errors.isEmpty)
    assert(r.chunks.nonEmpty)
    r.chunks.zipWithIndex.foreach { case (c, i) =>
      assert(c.chunkId == i)
      assert(c.key == TextKeys.stableChunkKey("https://store/container/annual_report-2026.txt", i))
      assert(c.title == "Annual Report 2026")
      assert(c.nTokens == RegexTokenizer.count(c.content))
      assert(c.nTokens <= p.maxTokens)
      assert(c.contentVector.length == 64)
    }
    // deterministic end to end
    val again = chunkDocument(text.getBytes("UTF-8"),
      "https://store/container/annual_report-2026.txt", "txt", p)
    assert(again.chunks.map(_.key) == r.chunks.map(_.key))
    assert(again.chunks.head.contentVector.toSeq == r.chunks.head.contentVector.toSeq)
  }

  test("structural problems are errors; thin content is a warning") {
    assert(chunkDocument(Array.emptyByteArray, "u", "txt", p).errors.nonEmpty)
    assert(chunkDocument("x".getBytes, "", "txt", p).errors.nonEmpty)
    assert(chunkDocument("   ".getBytes, "u", "txt", p).errors.nonEmpty)
    // degenerate slash-only url must not throw (no path segment to name)
    val slashes = chunkDocument(("word " * 20).getBytes, "///", "txt", p)
    assert(slashes.errors.isEmpty && slashes.chunks.nonEmpty)
    val thin = chunkDocument("word".getBytes, "https://u/f.txt", "txt", p)
    assert(thin.errors.isEmpty)
    assert(thin.chunks.isEmpty)
    assert(thin.warnings.exists(_.contains("token minimum")))
  }

  test("markdown dispatch splits on headings") {
    val md = "# One\n\n" + ("aa bb cc dd. " * 30) + "\n\n# Two\n\n" + ("ee ff gg hh. " * 30)
    val r = chunkDocument(md.getBytes("UTF-8"), "https://u/doc.md", "md", p)
    assert(r.chunks.length >= 2)
    // the "\n# " separator stays attached to the preceding piece, so assert
    // on section bodies: they must land in different chunks
    val withOne = r.chunks.filter(_.content.contains("aa bb cc"))
    val withTwo = r.chunks.filter(_.content.contains("ee ff gg"))
    assert(withOne.nonEmpty && withTwo.nonEmpty)
    assert(withOne.map(_.chunkId).toSet.intersect(withTwo.map(_.chunkId).toSet).isEmpty)
  }
}
