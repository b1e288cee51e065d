package graft.services

import com.fasterxml.jackson.databind.ObjectMapper
import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** HTTP transport binding the [[Retry]]/[[Poll]] envelopes to the
  * reference's service wire shapes (submit → 202 + Operation-Location →
  * poll, tools/doc_intelligence.py:141-198; chat/embedding POSTs,
  * tools/aoai.py:210-276). JDK `HttpURLConnection` only — no client
  * library exists in the runtime, and one connection per call is the
  * lifecycle the per-partition task clients already assume.
  *
  * Status mapping, shared by every adapter here:
  *  - 429 → [[RetryableException]] carrying the parsed `Retry-After`
  *    (seconds per RFC 9110) — the server's pacing overrides the backoff
  *    curve;
  *  - 5xx and connect/read `IOException` → [[RetryableException]]
  *    (transient);
  *  - any other non-2xx → terminal: a 400 never succeeds on retry and
  *    must surface immediately instead of burning the attempt budget.
  */
object HttpServiceClient {

  final case class Response(status: Int, body: String, headers: Map[String, String])

  private val mapper = new ObjectMapper()

  /** One raw HTTP exchange. Header names are lowercased (HTTP headers are
    * case-insensitive; the JDK server emits canonical case).
    */
  def request(method: String, url: String, body: Option[Array[Byte]] = None,
      contentType: String = "application/json",
      headers: Map[String, String] = Map.empty,
      timeoutMs: Int = 30000): Response = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      body.foreach { b =>
        conn.setRequestProperty("Content-Type", contentType)
        conn.setDoOutput(true)
        val os = conn.getOutputStream
        try { os.write(b); os.flush() } finally os.close()
      }
      val status = conn.getResponseCode
      val stream = Option(if (status >= 400) conn.getErrorStream else conn.getInputStream)
      val text = stream.map { s =>
        try new String(s.readAllBytes(), UTF_8) finally s.close()
      }.getOrElse("")
      val hs = {
        import scala.jdk.CollectionConverters._
        conn.getHeaderFields.asScala.collect {
          case (k, vs) if k != null && !vs.isEmpty =>
            k.toLowerCase(java.util.Locale.ROOT) -> vs.get(0)
        }.toMap
      }
      Response(status, text, hs)
    } finally conn.disconnect()
  }

  /** `request` with the transient-status contract applied: throws
    * [[RetryableException]] for 429 (Retry-After propagated) / 5xx /
    * IOException, returns everything else for the caller to interpret.
    */
  def checkedRequest(method: String, url: String, body: Option[Array[Byte]] = None,
      contentType: String = "application/json",
      headers: Map[String, String] = Map.empty): Response = {
    val r =
      try request(method, url, body, contentType, headers)
      catch {
        case e: IOException =>
          throw new RetryableException(s"transport error: ${e.getMessage}", None, e)
      }
    if (r.status == 429)
      throw new RetryableException("HTTP 429",
        r.headers.get("retry-after").flatMap(_.toLongOption).map(_ * 1000L))
    if (r.status >= 500)
      throw new RetryableException(s"HTTP ${r.status}")
    r
  }

  private def jsonText(body: String, path: String*): Option[String] = {
    try {
      var node = mapper.readTree(body)
      path.foreach { p => if (node != null) node = node.get(p) }
      Option(node).filter(!_.isMissingNode).map(n =>
        if (n.isTextual) n.asText() else n.toString)
    } catch { case _: Exception => None }
  }

  /** The analyze long-poll composed end-to-end: retried POST that must
    * yield 202 + Operation-Location, then a retried GET per poll tick
    * until the status JSON goes terminal. Returns Right((resultId,
    * analyzeResult JSON)) or Left(error) — the Poll contract: errors are
    * values the per-document loop accumulates.
    */
  def analyze(submitUrl: String, payload: Array[Byte],
      contentType: String = "application/octet-stream",
      headers: Map[String, String] = Map.empty,
      policy: RetryPolicy = RetryPolicy(),
      intervalMs: Long = 2000, maxPolls: Int = 150,
      sleeper: Long => Unit = Thread.sleep): Either[String, (String, String)] = {
    def submit(): Either[String, Poll.Submitted] =
      try {
        val r = Retry.withRetry(policy, sleeper)(() =>
          checkedRequest("POST", submitUrl, Some(payload), contentType, headers))
        if (r.status == 202)
          r.headers.get("operation-location").map(Poll.Submitted)
            .toRight("202 response without Operation-Location header")
        else Left(s"submit failed: HTTP ${r.status} ${r.body.take(200)}")
      } catch {
        case e: RetryableException => Left(s"submit failed after retries: ${e.getMessage}")
      }
    def probe(loc: String): Poll.Status[String] = {
      val r = Retry.withRetry(policy, sleeper)(() =>
        checkedRequest("GET", loc, None, "application/json", headers))
      if (r.status / 100 != 2) Poll.Failed(s"HTTP ${r.status} ${r.body.take(200)}")
      else jsonText(r.body, "status") match {
        case Some("succeeded") =>
          Poll.Succeeded(jsonText(r.body, "analyzeResult").getOrElse(""))
        case Some("failed") =>
          Poll.Failed(jsonText(r.body, "error", "message").getOrElse("operation failed"))
        case _ => Poll.Pending
      }
    }
    Poll.run(submit, probe, intervalMs, maxPolls, sleeper)
  }

  /** [[Embedder]] over the HTTP transport: one retried POST per batch
    * (`{"input": [texts…]}` → `{"data": [{"embedding": [floats…]}…]}`,
    * the embedding API shape of tools/aoai.py:210-264). Batch size and
    * pacing come from the enclosing mapPartitions pipeline.
    */
  final class HttpEmbedder(url: String, override val dim: Int,
      headers: Map[String, String] = Map.empty,
      policy: RetryPolicy = RetryPolicy(),
      sleeper: Long => Unit = Thread.sleep) extends Embedder {
    override def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = {
      val batch = texts.toSeq // materialized so a retry replays it
      val payload = mapper.createObjectNode()
      val arr = payload.putArray("input")
      batch.foreach(arr.add)
      val r = Retry.withRetry(policy, sleeper)(() =>
        checkedRequest("POST", url, Some(mapper.writeValueAsBytes(payload)),
          headers = headers))
      if (r.status / 100 != 2)
        throw new IllegalStateException(s"embed failed: HTTP ${r.status}")
      val data = mapper.readTree(r.body).get("data")
      require(data != null && data.size() == batch.size,
        s"embed response carried ${if (data == null) 0 else data.size()} vectors for ${batch.size} inputs")
      (0 until data.size()).iterator.map { i =>
        val emb = data.get(i).get("embedding")
        Array.tabulate(emb.size())(j => emb.get(j).floatValue())
      }
    }
  }

  /** [[Summarizer]] over the HTTP transport: retried chat-completion POST,
    * answer at `choices[0].message.content` (tools/aoai.py:266-276 shape).
    */
  final class HttpSummarizer(url: String,
      headers: Map[String, String] = Map.empty,
      policy: RetryPolicy = RetryPolicy(),
      sleeper: Long => Unit = Thread.sleep) extends Summarizer {
    override def summarize(text: String): String = {
      val payload = mapper.createObjectNode()
      payload.putArray("messages").addObject()
        .put("role", "user").put("content", text)
      val r = Retry.withRetry(policy, sleeper)(() =>
        checkedRequest("POST", url, Some(mapper.writeValueAsBytes(payload)),
          headers = headers))
      if (r.status / 100 != 2)
        throw new IllegalStateException(s"summarize failed: HTTP ${r.status}")
      jsonText(r.body, "choices").flatMap { _ =>
        val n = mapper.readTree(r.body).get("choices")
        if (n != null && n.size() > 0)
          Option(n.get(0).get("message")).flatMap(m => Option(m.get("content")))
            .map(_.asText())
        else None
      }.getOrElse(throw new IllegalStateException("summarize: no choices in response"))
    }
  }
}
