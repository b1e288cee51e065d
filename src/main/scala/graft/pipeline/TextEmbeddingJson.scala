package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.services.{Embedder, HashingEmbedder}

/** The `POST /text-embedding` skill edge as a pure function (SURVEY §3.1;
  * /root/reference/main.py:457-505): the second skill API the reference
  * exposes — `{values:[{recordId, data:{text}}]}` in,
  * `{values:[{recordId, data:{embedding}, errors, warnings}]}` out, one
  * output record per input record (unlike `/document-chunking`'s
  * last-item-wins batch rule, this endpoint processes EVERY item), with
  * per-record errors-in-envelope (an embed failure never 5xxs the batch).
  *
  * Same edge discipline as [[DocumentChunkingJson]]: `(requestJson,
  * embedder) → (status, responseJson)` so the HTTP layer stays a one-line
  * wrapper and the envelope is hermetically testable. The reference is
  * deliberately tolerant here — no draft-04 schema: a missing `recordId`
  * round-trips as null, a missing `data` or `text` embeds the empty
  * string (`item.get("data", {}).get("text", "")`); a PRESENT but
  * non-textual `text` (the default doesn't apply — the raw value reaches
  * the embedder and raises) surfaces as that record's `errors` entry.
  */
object TextEmbeddingJson {

  private val mapper = new ObjectMapper()

  /** Handle one request. `embedder` is the AOAI boundary
    * (main.py:472-489 `aoai_client.get_embeddings`); any exception it
    * throws becomes that record's `errors` entry, mirroring the
    * reference's per-record try/except.
    */
  def handle(requestJson: String,
      embedder: Embedder = new HashingEmbedder(64)): (Int, String) = {
    val body = try mapper.readTree(requestJson) catch {
      case e: Exception => return (400, quoteError(s"Invalid JSON: ${e.getMessage}"))
    }
    // main.py:467-469: `if not body or "values" not in body` → 400
    if (body == null || !body.isObject || body.get("values") == null ||
        !body.get("values").isArray)
      return (400, quoteError("Invalid body."))
    val values = body.get("values")
    val root = mapper.createObjectNode()
    val out = root.putArray("values")
    values.elements().forEachRemaining { item =>
      val rec = out.addObject()
      val rid: JsonNode = if (item.isObject) item.get("recordId") else null
      if (rid == null) rec.putNull("recordId")
      else rec.set("recordId", rid)
      val data = if (item.isObject) item.get("data") else null
      val textNode: JsonNode =
        if (data != null && data.isObject) data.get("text") else null
      val dataOut = rec.putObject("data")
      val errs = rec.putArray("errors")
      if (data != null && !data.isObject) {
        // a PRESENT but non-object data node: INTENTIONAL DIVERGENCE from
        // the reference, not parity. There `item.get("data", {}).get(
        // "text", "")` runs BEFORE the per-record try block (main.py:478),
        // so `{"data": 5}` raises an unhandled AttributeError and fails
        // the WHOLE request with a 500; here the malformed record gets a
        // per-record errors entry and its siblings still embed — the
        // same per-record envelope the reference applies to embedder
        // failures, extended to this malformed-input class
        errs.addObject().put("message",
          "Error generating embeddings: data is not an object")
      } else if (textNode != null && !textNode.isTextual) {
        // a PRESENT but non-textual text node (number, object, explicit
        // null) is a malformed record, not an empty document: the
        // reference's `.get("text", "")` only defaults when the key is
        // ABSENT, so the raw value reaches the embedder, which raises,
        // and the per-record try/except surfaces it as an errors entry —
        // embedding "" here would hand a plausible-looking vector to a
        // record that should signal
        errs.addObject().put("message",
          "Error generating embeddings: data.text is not a string")
      } else {
        // a MISSING data/text embeds the empty string
        // — main.py:471 `item.get("data", {}).get("text", "")`
        val text = if (textNode != null && textNode.isTextual)
          textNode.asText else ""
        try {
          val vec = embedder.embed(text)
          val arr = dataOut.putArray("embedding")
          vec.foreach(arr.add(_))
        } catch {
          case e: Exception =>
            // data stays {} (main.py:481: data_payload only set on success)
            dataOut.removeAll()
            errs.addObject().put("message",
              s"Error generating embeddings: ${e.getMessage}")
        }
      }
      rec.putArray("warnings")
    }
    (200, mapper.writeValueAsString(root))
  }

  private def quoteError(msg: String): String = {
    val n = mapper.createObjectNode()
    n.put("error", msg)
    mapper.writeValueAsString(n)
  }
}
