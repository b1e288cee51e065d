package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core.SplitParams
import graft.services.{Embedder, HashingEmbedder}

/** The `/document-chunking` JSON edge as a pure function (SURVEY §3.1;
  * /root/reference/main.py:355-452): parse → draft-04-equivalent schema
  * validation → last-item-wins batch rule → fetch (injected — the blob
  * boundary) → chunk via [[DocumentChunkingApi]] → `{values:[{recordId,
  * data:{chunks}, errors, warnings}]}` envelope.
  *
  * Keeping the edge a `(requestJson, fetcher) → (status, responseJson)`
  * function means an HTTP server is a one-line wrapper while everything the
  * reference validates and shapes — the part a caller programs against —
  * is implemented and testable hermetically. Jackson comes from Spark's own
  * classpath; no extra dependency.
  */
object DocumentChunkingJson {

  private val mapper = new ObjectMapper()

  /** contentType → chunker extension (chunker_factory.py:34-72 dispatch). */
  val contentTypeExt: Map[String, String] = Map(
    "application/pdf" -> "pdf",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet" -> "xlsx",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document" -> "docx",
    "text/markdown" -> "md",
    "application/json" -> "json",
    "text/vtt" -> "vtt",
    "text/csv" -> "csv",
    "text/html" -> "html",
    "text/plain" -> "txt")

  /** Mirror of the reference's draft-04 request schema (main.py:423-452):
    * values: non-empty array of {recordId: string, data: {documentUrl:
    * string minLength 1, documentContentType: string minLength 1}}.
    * Returns the first violation, reference-style, or None when valid.
    */
  def validate(body: JsonNode): Option[String] = {
    if (body == null || !body.isObject) return Some("body must be an object")
    val values = body.get("values")
    if (values == null) return Some("'values' is a required property")
    if (!values.isArray) return Some("'values' must be an array")
    if (values.isEmpty) return Some("'values' must have at least 1 item")
    var i = 0
    val it = values.elements()
    while (it.hasNext) {
      val item = it.next()
      if (!item.isObject) return Some(s"values[$i] must be an object")
      val rid = item.get("recordId")
      if (rid == null) return Some(s"values[$i]: 'recordId' is a required property")
      if (!rid.isTextual) return Some(s"values[$i]: 'recordId' must be a string")
      val data = item.get("data")
      if (data == null) return Some(s"values[$i]: 'data' is a required property")
      if (!data.isObject) return Some(s"values[$i]: 'data' must be an object")
      for (f <- Seq("documentUrl", "documentContentType")) {
        val v = data.get(f)
        if (v == null) return Some(s"values[$i].data: '$f' is a required property")
        if (!v.isTextual) return Some(s"values[$i].data: '$f' must be a string")
        if (v.asText.isEmpty) return Some(s"values[$i].data: '$f' must not be empty")
      }
      i += 1
    }
    None
  }

  /** Handle one request. `fetch` is the documentUrl → bytes boundary (the
    * reference's BlobClient.download_blob); any exception it throws becomes
    * a per-record error, not a 5xx, matching the errors-in-envelope style.
    */
  def handle(requestJson: String, fetch: String => Array[Byte],
      p: SplitParams = SplitParams(maxTokens = 512, overlapTokens = 64, minChunkTokens = 10),
      embedder: Embedder = new HashingEmbedder(64)): (Int, String) = {
    val body = try mapper.readTree(requestJson) catch {
      case e: Exception => return (400, quoteError(s"Invalid JSON: ${e.getMessage}"))
    }
    validate(body) match {
      case Some(err) => return (400, quoteError(s"Invalid request: $err"))
      case None =>
    }
    val values = body.get("values").asInstanceOf[ArrayNode]
    // BatchSize should be 1; the reference processes only the LAST item
    val item = values.get(values.size() - 1)
    val data = item.get("data")
    val url = data.get("documentUrl").asText
    val contentType = data.get("documentContentType").asText
    val fileName = url.split('/').filter(_.nonEmpty).lastOption.getOrElse(url)
    val ext = contentTypeExt.getOrElse(
      contentType.toLowerCase(java.util.Locale.ROOT),
      fileName.split('.').drop(1).lastOption.getOrElse("txt"))
      .toLowerCase(java.util.Locale.ROOT)

    val response =
      try {
        val bytes = fetch(url)
        DocumentChunkingApi.chunkDocument(bytes, url, ext, p, embedder)
      } catch {
        case e: Exception =>
          DocumentChunkingApi.ChunkingResponse(Nil, Seq(s"fetch failed: ${e.getMessage}"), Nil)
      }

    val root = mapper.createObjectNode()
    val outValues = root.putArray("values")
    val rec = outValues.addObject()
    rec.put("recordId", item.get("recordId").asText)
    val chunksArr = rec.putObject("data").putArray("chunks")
    response.chunks.foreach { c =>
      val n: ObjectNode = chunksArr.addObject()
      n.put("chunkId", c.chunkId)
      n.put("key", c.key)
      n.put("title", c.title)
      n.put("content", c.content)
      n.put("nTokens", c.nTokens)
      n.put("source", "blob") // main.py:397-398
      val vec = n.putArray("contentVector")
      c.contentVector.foreach(vec.add(_))
    }
    val errs = rec.putArray("errors")
    response.errors.foreach(e => errs.addObject().put("message", e))
    val warns = rec.putArray("warnings")
    response.warnings.foreach(w => warns.addObject().put("message", w))
    (200, mapper.writeValueAsString(root))
  }

  private def quoteError(msg: String): String = {
    val n = mapper.createObjectNode()
    n.put("error", msg)
    mapper.writeValueAsString(n)
  }
}
