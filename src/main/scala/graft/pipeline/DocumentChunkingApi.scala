package graft.pipeline

import graft.core.{SplitParams, TextKeys}
import graft.services.{Embedder, HashingEmbedder}

/** The reference's synchronous `/document-chunking` skill entry (SURVEY
  * §3.1; /root/reference/main.py:355-421) as a library facade: validate →
  * decode → dispatch-by-extension → chunk → enrich (keys, title, token
  * counts, embedding) → respond with per-record errors/warnings instead of
  * throwing.
  *
  * This is the one-document path; the corpus-scale path is the same
  * [[Chunkers.chunkText]] dispatch inside the distributed explode. Keeping
  * the facade a pure function of (bytes, url, ext, cfg) means an HTTP layer
  * is a five-line wrapper and tests stay hermetic.
  */
object DocumentChunkingApi {

  final case class ChunkRecord(
      chunkId: Int,
      key: String,
      title: String,
      content: String,
      nTokens: Int,
      contentVector: Array[Float])

  final case class ChunkingResponse(
      chunks: Seq[ChunkRecord],
      errors: Seq[String],
      warnings: Seq[String])

  val maxContentBytes = 32766 // AI Search field limit (base_chunker.py:194-207)

  /** Chunk one document. Mirrors the reference's response contract:
    * structural problems are `errors` (no chunks), recoverable oddities are
    * `warnings` (chunks still returned).
    */
  def chunkDocument(documentBytes: Array[Byte], documentUrl: String, ext: String,
      p: SplitParams = SplitParams(maxTokens = 512, overlapTokens = 64, minChunkTokens = 10),
      embedder: Embedder = new HashingEmbedder(64)): ChunkingResponse = {
    if (documentBytes == null || documentBytes.isEmpty)
      return ChunkingResponse(Nil, Seq("documentBytes is empty"), Nil)
    if (documentUrl == null || documentUrl.isEmpty)
      return ChunkingResponse(Nil, Seq("documentUrl is required"), Nil)

    // S13: binary containers (Chunkers.binaryExts: pdf/docx/xlsx/pptx)
    // decode structurally; text
    // formats detect their encoding first (X7, base_chunker.py:295-306) —
    // BOM / UTF-8 validation / UTF-16 heuristic / windows-1252 fallback
    // extensions are case-insensitive everywhere downstream ("Report.PDF"
    // must hit the structural decoder, not the charset path); ROOT locale
    // so a Turkish-locale JVM lowercases identically
    val extSafe = if (ext == null) "txt" else ext.toLowerCase(java.util.Locale.ROOT)
    val (text, charset) =
      if (Chunkers.binaryExts(extSafe))
        (try Chunkers.extractText(documentBytes, extSafe) catch {
          case e: Exception =>
            return ChunkingResponse(Nil, Seq(s"$extSafe decode failed: ${e.getMessage}"), Nil)
        }, "binary")
      else graft.core.Charsets.decodeDetected(documentBytes)
    if (text == null || text.trim.isEmpty)
      return ChunkingResponse(Nil, Seq("document decodes to empty text"), Nil)

    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    if (charset != "UTF-8" && charset != "binary")
      warnings += s"decoded with detected charset $charset"
    val fileName = documentUrl.split('/').filter(_.nonEmpty).lastOption
      .getOrElse(documentUrl)
    val title = TextKeys.titleFromFilename(fileName)

    // truncate to the sink's byte cap BEFORE enrichment so token counts and
    // embeddings describe the content actually stored
    val pieces: Seq[(String, Int)] =
      Chunkers.chunkText(text, extSafe, p)
        .zipWithIndex.map { case (c0, i) =>
          if (c0.getBytes("UTF-8").length <= maxContentBytes) c0
          else {
            warnings += s"chunk $i truncated to $maxContentBytes bytes"
            TextKeys.utf8SafeTruncate(c0, maxContentBytes)
          }
        }
        .map(c => (c, p.tokenizer.count(c)))
        .filter(_._2 >= p.minChunkTokens)
    if (pieces.isEmpty)
      warnings += s"no chunk met the ${p.minChunkTokens}-token minimum"

    val vectors = embedder.embedBatch(pieces.iterator.map(_._1)).toSeq
    // strict zip (not lazyZip): the truncation warnings above must all be
    // recorded before the response is assembled, regardless of field order
    val chunks = pieces.zip(vectors).zipWithIndex.map { case (((c, n), vec), i) =>
      ChunkRecord(i, TextKeys.stableChunkKey(documentUrl, i), title, c, n, vec)
    }
    ChunkingResponse(chunks, Nil, warnings.toSeq)
  }
}
