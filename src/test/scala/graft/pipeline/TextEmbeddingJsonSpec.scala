package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

import graft.services.{Embedder, HashingEmbedder}

/** `/text-embedding` envelope parity with the reference
  * (main.py:457-505): success, per-record error, empty/missing text,
  * multi-record batches (EVERY item processed, unlike the chunking
  * endpoint's last-item rule), and the 400 edges.
  */
class TextEmbeddingJsonSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** An embedder whose failure mode is data-dependent — drives the
    * reference's per-record try/except path.
    */
  private class FailingEmbedder extends Embedder {
    val dim = 4
    def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] =
      texts.map { t =>
        if (t.contains("boom")) throw new RuntimeException("upstream 500")
        Array.fill(dim)(t.length.toFloat)
      }
  }

  test("success envelope: one output record per input, embedding + empty errors/warnings") {
    val (status, body) = TextEmbeddingJson.handle(
      """{"values":[{"recordId":"r1","data":{"text":"hello world"}},
        |           {"recordId":"r2","data":{"text":"second doc"}}]}""".stripMargin,
      new HashingEmbedder(8))
    assert(status == 200)
    val values = mapper.readTree(body).get("values")
    assert(values.size() == 2, "every item processed, not last-item-wins")
    (0 until 2).foreach { i =>
      val rec = values.get(i)
      assert(rec.get("recordId").asText == s"r${i + 1}")
      assert(rec.get("data").get("embedding").size() == 8)
      assert(rec.get("errors").size() == 0)
      assert(rec.get("warnings").size() == 0)
    }
  }

  test("per-record error: failing record gets errors + empty data; others still succeed") {
    val (status, body) = TextEmbeddingJson.handle(
      """{"values":[{"recordId":"ok","data":{"text":"fine"}},
        |           {"recordId":"bad","data":{"text":"boom here"}}]}""".stripMargin,
      new FailingEmbedder)
    assert(status == 200, "an embed failure never 5xxs the batch")
    val values = mapper.readTree(body).get("values")
    val ok = values.get(0)
    assert(ok.get("data").get("embedding").size() == 4)
    assert(ok.get("errors").size() == 0)
    val bad = values.get(1)
    assert(bad.get("recordId").asText == "bad")
    assert(bad.get("data").size() == 0, "data stays {} on failure (main.py:481)")
    assert(bad.get("errors").size() == 1)
    assert(bad.get("errors").get(0).get("message").asText
      .startsWith("Error generating embeddings:"))
    assert(bad.get("warnings").size() == 0)
  }

  test("empty and missing text embed the empty string (main.py tolerant get chain)") {
    val (status, body) = TextEmbeddingJson.handle(
      """{"values":[{"recordId":"e1","data":{"text":""}},
        |           {"recordId":"e2","data":{}},
        |           {"recordId":"e3"}]}""".stripMargin,
      new HashingEmbedder(8))
    assert(status == 200)
    val values = mapper.readTree(body).get("values")
    (0 until 3).foreach { i =>
      val rec = values.get(i)
      assert(rec.get("data").get("embedding").size() == 8,
        s"record $i must embed '' instead of erroring")
      assert(rec.get("errors").size() == 0)
    }
  }

  test("present-but-non-textual text is a per-record error, not an empty embed") {
    // the reference's .get("text", "") only defaults when the key is
    // ABSENT — a number/object/null value reaches the embedder and
    // raises, so these records must surface errors, not a ""-embedding
    val (status, body) = TextEmbeddingJson.handle(
      """{"values":[{"recordId":"n1","data":{"text":42}},
        |           {"recordId":"n2","data":{"text":{"nested":true}}},
        |           {"recordId":"n3","data":{"text":null}},
        |           {"recordId":"ok","data":{"text":"fine"}}]}""".stripMargin,
      new HashingEmbedder(8))
    assert(status == 200)
    val values = mapper.readTree(body).get("values")
    (0 until 3).foreach { i =>
      val rec = values.get(i)
      assert(rec.get("data").size() == 0, s"record $i data must stay {}")
      assert(rec.get("errors").size() == 1, s"record $i must error")
      assert(rec.get("errors").get(0).get("message").asText
        .startsWith("Error generating embeddings:"))
    }
    val ok = values.get(3)
    assert(ok.get("data").get("embedding").size() == 8)
    assert(ok.get("errors").size() == 0)
  }

  test("missing recordId round-trips as null, reference-style") {
    val (status, body) = TextEmbeddingJson.handle(
      """{"values":[{"data":{"text":"anonymous"}}]}""", new HashingEmbedder(8))
    assert(status == 200)
    val rec = mapper.readTree(body).get("values").get(0)
    assert(rec.get("recordId").isNull)
    assert(rec.get("data").get("embedding").size() == 8)
  }

  test("present-but-non-object data surfaces a per-record error") {
    // the reference's item.get("data", {}) only defaults when the key is
    // ABSENT: {"data": 5} reaches .get("text", "") and raises, so the
    // record must error, not embed "" (same class as non-textual text)
    val (st, body) = TextEmbeddingJson.handle(
      """{"values":[{"recordId":"a","data":5},
        |{"recordId":"b","data":{"text":"fine"}}]}""".stripMargin)
    assert(st == 200)
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val recs = n.get("values")
    assert(recs.get(0).get("errors").size() == 1 &&
      recs.get(0).get("errors").get(0).get("message").asText
        .contains("data is not an object"))
    assert(recs.get(0).get("data").size() == 0)
    assert(recs.get(1).get("errors").size() == 0 &&
      recs.get(1).get("data").has("embedding"))
  }

  test("invalid JSON and missing values are 400") {
    assert(TextEmbeddingJson.handle("{not json")._1 == 400)
    val (s1, b1) = TextEmbeddingJson.handle("""{"nope":1}""")
    assert(s1 == 400 && b1.contains("Invalid body."))
    assert(TextEmbeddingJson.handle("""{"values":"notarray"}""")._1 == 400)
  }

  test("HTTP round-trip on the shared server") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val server = DocumentChunkingServer.start(0, fetch = _ => Array.emptyByteArray)
    try {
      val client = HttpClient.newHttpClient()
      val resp = client.send(HttpRequest.newBuilder(
          URI.create(s"http://localhost:${server.getAddress.getPort}/text-embedding"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"values":[{"recordId":"h1","data":{"text":"over http"}}]}"""))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.body().contains("\"recordId\":\"h1\""))
      assert(resp.body().contains("\"embedding\":["))
      val get = client.send(HttpRequest.newBuilder(
          URI.create(s"http://localhost:${server.getAddress.getPort}/text-embedding"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 405)
    } finally server.stop(0)
  }
}
