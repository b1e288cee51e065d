package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The /document-chunking JSON edge (SURVEY §3.1, main.py:355-452):
  * parse / validate / last-item batch rule / envelope shape.
  */
class DocumentChunkingJsonSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def fetchText(text: String): String => Array[Byte] =
    _ => text.getBytes("UTF-8")

  private def req(url: String, ct: String, rid: String = "r1"): String =
    s"""{"values":[{"recordId":"$rid","data":{"documentUrl":"$url","documentContentType":"$ct"}}]}"""

  test("happy path: 200 with the reference envelope shape") {
    val (code, body) = DocumentChunkingJson.handle(
      req("https://acct/container/report.txt", "text/plain"),
      fetchText("one two three four five six seven eight nine ten. " * 30))
    assert(code == 200)
    val root = mapper.readTree(body)
    val rec = root.get("values").get(0)
    assert(rec.get("recordId").asText == "r1")
    val chunks = rec.get("data").get("chunks")
    assert(chunks.size() > 0)
    val c0 = chunks.get(0)
    assert(c0.get("source").asText == "blob")
    assert(c0.get("title").asText == "Report")
    assert(c0.get("nTokens").asInt > 0)
    assert(c0.get("contentVector").size() == 64)
    assert(rec.get("errors").isEmpty && rec.get("warnings").isEmpty)
  }

  test("invalid JSON and schema violations are 400 with the first failure") {
    assert(DocumentChunkingJson.handle("{nope", fetchText("x"))._1 == 400)
    val cases = Seq(
      """{}""" -> "'values' is a required property",
      """{"values":[]}""" -> "at least 1 item",
      """{"values":[{"data":{"documentUrl":"u","documentContentType":"t"}}]}""" ->
        "'recordId' is a required property",
      """{"values":[{"recordId":"r","data":{"documentContentType":"t"}}]}""" ->
        "'documentUrl' is a required property",
      """{"values":[{"recordId":"r","data":{"documentUrl":"","documentContentType":"t"}}]}""" ->
        "must not be empty")
    cases.foreach { case (body, expect) =>
      val (code, resp) = DocumentChunkingJson.handle(body, fetchText("x"))
      assert(code == 400, body)
      assert(resp.contains(expect), s"$body → $resp")
    }
  }

  test("batch >1: only the LAST item is processed (main.py:380-382)") {
    val body =
      """{"values":[
        | {"recordId":"first","data":{"documentUrl":"a/first.txt","documentContentType":"text/plain"}},
        | {"recordId":"last","data":{"documentUrl":"a/last.txt","documentContentType":"text/plain"}}
        |]}""".stripMargin
    val (code, resp) = DocumentChunkingJson.handle(body,
      fetchText("some repeated text for chunking purposes here. " * 20))
    assert(code == 200)
    val root = mapper.readTree(resp)
    assert(root.get("values").size() == 1)
    assert(root.get("values").get(0).get("recordId").asText == "last")
  }

  test("contentType dispatch: an xlsx payload chunks through the real decoder") {
    val xlsx = graft.formats.Ooxml.writeXlsx(Seq(graft.formats.Ooxml.XlsxSheet("S",
      Seq(Seq("h1", "h2")) ++ (1 to 40).map(i => Seq(s"cell$i", s"value$i")))))
    val (code, resp) = DocumentChunkingJson.handle(
      req("https://acct/c/book.xlsx",
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"),
      _ => xlsx,
      p = graft.core.SplitParams(maxTokens = 64, overlapTokens = 0, minChunkTokens = 1))
    assert(code == 200)
    val chunks = mapper.readTree(resp).get("values").get(0).get("data").get("chunks")
    assert(chunks.size() > 0)
    assert(chunks.get(0).get("content").asText.contains("| h1 | h2 |"))
  }

  test("fetch failure lands in errors, not an exception") {
    val (code, resp) = DocumentChunkingJson.handle(
      req("https://acct/c/gone.txt", "text/plain"),
      _ => throw new RuntimeException("404 blob not found"))
    assert(code == 200)
    val rec = mapper.readTree(resp).get("values").get(0)
    assert(rec.get("errors").get(0).get("message").asText.contains("404"))
    assert(rec.get("data").get("chunks").isEmpty)
  }
}
