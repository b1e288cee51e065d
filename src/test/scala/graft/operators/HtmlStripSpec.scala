package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-computed fixtures for the HTML boilerplate stripper: tag removal,
  * script/style content removal (not just the tags), entity decode order
  * (&amp; last, so "&amp;lt;" decodes to the literal "&lt;" not "<"), and
  * whitespace collapse.
  */
class HtmlStripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strip(html: String): String =
    TextAnalysis.stripHtml(Seq(html).toDF("html"), "html")
      .select("plain").collect().head.getString(0)

  test("tags removed, text kept, whitespace collapsed") {
    assert(strip("<html><body><h1>Title</h1>\n<p>two  words</p></body></html>")
      == "Title two words")
  }

  test("script and style CONTENT is dropped, not just the tags") {
    assert(strip("<head><script>var x = '<p>not text</p>';</script>" +
      "<style>p{color:red}</style></head><body>kept</body>") == "kept")
    // case-insensitive, attributes allowed, newlines inside the block
    assert(strip("<SCRIPT type=\"a\">\nline1\nline2\n</SCRIPT>ok") == "ok")
  }

  test("entities decode, ampersand last") {
    assert(strip("a &lt;b&gt; &quot;c&#39;s&quot; &nbsp; d &amp; e")
      == "a <b> \"c's\" d & e")
    assert(strip("&amp;lt;") == "&lt;", "double-encoded stays encoded once")
  }

  test("unclosed script block degrades to plain tag removal") {
    // no closing tag -> the block regex does not match; only tags drop
    assert(strip("<script>orphan") == "orphan")
  }
}
