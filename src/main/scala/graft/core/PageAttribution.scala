package graft.core

import scala.collection.mutable.ArrayBuffer

/** Page-break numbering and chunk→page attribution (SURVEY §2.6 W2; behavior
  * spec: /root/reference/chunking/chunkers/doc_analysis_chunker.py:391-446
  * and utils/file_utils.py:122-138).
  *
  * Layout analysis emits unnumbered `<!-- PageBreak -->` markers. The engine
  * (1) numbers them sequentially (5 digits), (2) when a document was analyzed
  * in parts, renumbers each part with the cumulative page offset so numbering
  * is continuous, and (3) attributes each text chunk to a page: if the first
  * marker inside the chunk sits in the first half of the chunk, the chunk
  * "belongs" to that marker's page; otherwise it belongs to the page carried
  * in from the previous chunk. The carried page always advances to the last
  * marker seen.
  */
object PageAttribution {
  val RawMarker = "<!-- PageBreak -->"
  private val Numbered = """<!-- PageBreak(\d{5}) -->""".r

  /** Number raw markers sequentially starting at `firstPage`; returns the
    * numbered text and the number of markers found.
    */
  def numberMarkers(text: String, firstPage: Int = 1): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var from = 0
    var page = firstPage
    var i = text.indexOf(RawMarker)
    while (i >= 0) {
      sb.append(text, from, i).append(f"<!-- PageBreak$page%05d -->")
      page += 1
      from = i + RawMarker.length
      i = text.indexOf(RawMarker, from)
    }
    sb.append(text, from, text.length)
    (sb.toString, page - firstPage)
  }

  /** Number markers across analysis parts with continuous page numbers
    * (split-PDF renumbering). Returns the concatenated document.
    */
  def renumberParts(parts: Seq[String]): String = {
    var page = 1
    val out = parts.map { p =>
      val (numbered, n) = numberMarkers(p, page)
      page += n
      numbered
    }
    out.mkString("")
  }

  /** Markers inside one chunk: (charOffset, pageNumber). */
  private[core] def markersIn(chunk: String): Seq[(Int, Int)] = {
    val out = ArrayBuffer.empty[(Int, Int)]
    val m = Numbered.pattern.matcher(chunk)
    while (m.find()) out += ((m.start, m.group(1).toInt))
    out.toSeq
  }

  /** Page per chunk via the <50%-position rule, carrying state across chunks. */
  def attributePages(chunks: Seq[String], initialPage: Int = 1): Seq[Int] = {
    var current = initialPage
    chunks.map { c =>
      val ms = markersIn(c)
      val page =
        if (ms.isEmpty) current
        else {
          val (pos, firstPage) = ms.head
          // marker early in the chunk → most content is on the new page
          if (pos.toDouble < c.length / 2.0) firstPage + 1 else current
        }
      if (ms.nonEmpty) current = ms.last._2 + 1
      page
    }
  }

  /** Strip markers from final chunk content. */
  def stripMarkers(chunk: String): String =
    Numbered.replaceAllIn(chunk, "").replace(RawMarker, "")
}
