package graft.pipeline

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import graft.core.SplitParams
import graft.services.{Embedder, HashingEmbedder}

/** The thin HTTP layer over [[DocumentChunkingJson]] (SURVEY §3.1;
  * /root/reference/main.py:355 `POST /document-chunking`), on the JDK's
  * built-in server — no dependency, no framework. Everything interesting
  * (validation, batch rule, dispatch, envelope) lives in the pure
  * function; this class only moves bytes, which is the point: the engine
  * is a library first and the reference's service surface is one
  * `start()` away.
  */
object DocumentChunkingServer {

  /** Start serving on `port` (0 ⇒ ephemeral; read it back from the return
    * value). `fetch` is the documentUrl → bytes boundary.
    */
  def start(port: Int, fetch: String => Array[Byte],
      p: SplitParams = SplitParams(maxTokens = 512, overlapTokens = 64, minChunkTokens = 10),
      embedder: Embedder = new HashingEmbedder(64)): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    // ONE copy of the HTTP envelope (method check, body read, JSON
    // headers, write, close) — each skill endpoint is its pure handler
    // plus this wrapper, so an envelope fix lands on every endpoint
    def postJson(path: String)(handle: String => (Int, String)): Unit =
      server.createContext(path, (exchange: HttpExchange) => {
        try {
          val (status, body) =
            if (exchange.getRequestMethod != "POST")
              (405, """{"error":"method not allowed"}""")
            else handle(
              new String(exchange.getRequestBody.readAllBytes(), UTF_8))
          val bytes = body.getBytes(UTF_8)
          exchange.getResponseHeaders.set("Content-Type", "application/json")
          exchange.sendResponseHeaders(status, bytes.length)
          exchange.getResponseBody.write(bytes)
        } finally exchange.close()
      })
    postJson("/document-chunking")(
      DocumentChunkingJson.handle(_, fetch, p, embedder))
    // the second skill endpoint the reference exposes (main.py:457-505):
    // per-record embedding with errors-in-envelope
    postJson("/text-embedding")(TextEmbeddingJson.handle(_, embedder))
    server.setExecutor(null) // request-thread executor; one doc per call
    server.start()
    server
  }
}
