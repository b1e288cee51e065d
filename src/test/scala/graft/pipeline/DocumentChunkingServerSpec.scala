package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Real HTTP round-trip over the §3.1 endpoint (main.py:355 parity). */
class DocumentChunkingServerSpec extends AnyFunSuite {

  private def withServer(test: (Int, HttpClient) => Unit): Unit = {
    val server = DocumentChunkingServer.start(0,
      fetch = _ => ("alpha beta gamma delta epsilon. " * 40).getBytes("UTF-8"))
    try test(server.getAddress.getPort, HttpClient.newHttpClient())
    finally server.stop(0)
  }

  private def post(client: HttpClient, port: Int, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(
        URI.create(s"http://localhost:$port/document-chunking"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST round-trip: 200 + envelope over real HTTP") {
    withServer { (port, client) =>
      val resp = post(client, port,
        """{"values":[{"recordId":"r9","data":{"documentUrl":"https://a/c/doc.txt","documentContentType":"text/plain"}}]}""")
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").orElse("") == "application/json")
      assert(resp.body().contains("\"recordId\":\"r9\""))
      assert(resp.body().contains("\"chunks\":["))
    }
  }

  test("invalid body is 400; wrong method is 405") {
    withServer { (port, client) =>
      assert(post(client, port, "{garbage").statusCode() == 400)
      val get = client.send(HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/document-chunking")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 405)
    }
  }
}
