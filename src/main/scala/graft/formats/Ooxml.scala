package graft.formats

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** Real OOXML binary decoders (SURVEY §2.1 S13, §2.9 C1/C3), JDK-only.
  *
  * The reference parses real xlsx via openpyxl
  * (/root/reference/chunking/chunkers/spreadsheet_chunker.py:88) and docx
  * via layout services (/root/reference/tools/doc_intelligence.py:88-198).
  * OOXML is just a zip of XML parts, so the container (java.util.zip) and
  * the parts (StAX) need no third-party code:
  *
  *  - xlsx: workbook.xml (sheet order) + workbook rels (sheet targets) +
  *    sharedStrings.xml + worksheets/sheetN.xml, with A1-style cell refs
  *    resolved to dense rows (gap cells become ""), shared / inline /
  *    literal cell types all handled;
  *  - docx: word/document.xml paragraphs — run text concatenated, tabs and
  *    breaks normalized.
  *
  * Writers for both formats exist so gate fixtures and round-trip tests are
  * hermetic and deterministic; the read path is the operator under test.
  */
object Ooxml {

  final case class XlsxSheet(name: String, rows: Seq[Seq[String]])

  private val xmlFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // fixture XML is self-contained; never fetch DTDs / external entities
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** All entries of a zip payload, name → bytes. Streams the central
    * directory-less format sequentially — fine for document-sized payloads
    * (each task holds one document at a time).
    */
  def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      var e: ZipEntry = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out += e.getName -> zis.readAllBytes()
        zis.closeEntry()
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.result()
  }

  private def reader(part: Array[Byte]): XMLStreamReader =
    xmlFactory.createXMLStreamReader(new ByteArrayInputStream(part), "UTF-8")

  /** Collect the text content of every element named `tag` (namespace
    * ignored — OOXML parts bind w:/x: prefixes but local names are unique
    * enough for the parts we read), grouped by enclosing `group` element.
    */
  private def groupedText(part: Array[Byte], group: String, tag: String): Seq[String] = {
    val r = reader(part)
    val items = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inGroup = false
    var inTag = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val n = r.getLocalName
            if (n == group) { inGroup = true; cur.clear() }
            else if (inGroup && n == tag) inTag = true
            else if (inGroup && n == "tab") cur.append('\t')
            else if (inGroup && (n == "br" || n == "cr")) cur.append('\n')
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inTag) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            val n = r.getLocalName
            if (n == tag) inTag = false
            else if (n == group) { inGroup = false; items += cur.toString }
          case _ =>
        }
      }
    } finally r.close()
    items.result()
  }

  /** A1-style column letters → 0-based index ("A"→0, "AB"→27). */
  def columnIndex(cellRef: String): Int = {
    var i = 0
    var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  // ---------------------------------------------------------------- xlsx read

  /** Parse one worksheet part into dense rows (A1 refs resolved, gaps ""). */
  private def parseWorksheet(part: Array[Byte], shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val r = reader(part)
    val rows = Seq.newBuilder[Seq[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellType = ""
    var cellCol = -1
    var nextCol = 0
    var inV = false
    var inIs = false
    val v = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" =>
              row = scala.collection.mutable.ArrayBuffer.empty[String]
              nextCol = 0
            case "c" if row != null =>
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(columnIndex).getOrElse(nextCol)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              v.clear()
            case "v" => inV = true
            case "is" => inIs = true
            case "t" if inIs => inV = true
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV) v.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "v" => inV = false
            case "t" if inIs => inV = false
            case "is" => inIs = false
            case "c" if row != null =>
              val text = cellType match {
                case "s" =>
                  val i = v.toString.trim.toInt
                  if (i >= 0 && i < shared.length) shared(i) else ""
                case _ => v.toString
              }
              while (row.length < cellCol) row += ""
              if (cellCol >= 0) {
                if (row.length == cellCol) row += text else row(cellCol) = text
              }
              nextCol = cellCol + 1
            case "row" =>
              rows += row.toSeq
              row = null
            case _ =>
          }
          case _ =>
        }
      }
    } finally r.close()
    rows.result()
  }

  /** Decode an xlsx payload into its sheets, workbook order preserved. */
  def readXlsx(bytes: Array[Byte]): Seq[XlsxSheet] = {
    val parts = zipEntries(bytes)
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml")
      .map(p => groupedText(p, "si", "t").toIndexedSeq)
      .getOrElse(IndexedSeq.empty)
    // sheet name + relationship id, in workbook (tab) order
    val sheets = {
      val r = reader(parts("xl/workbook.xml"))
      val b = Seq.newBuilder[(String, String)]
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
            val name = r.getAttributeValue(null, "name")
            // r:id is namespaced; find it by local name
            val rid = (0 until r.getAttributeCount)
              .find(i => r.getAttributeLocalName(i) == "id")
              .map(r.getAttributeValue).getOrElse("")
            b += ((name, rid))
          }
        }
      } finally r.close()
      b.result()
    }
    // rId → part path (targets are relative to xl/)
    val rels: Map[String, String] = parts.get("xl/_rels/workbook.xml.rels").map { p =>
      val r = reader(p)
      val b = Map.newBuilder[String, String]
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
            val id = r.getAttributeValue(null, "Id")
            val target = r.getAttributeValue(null, "Target")
            // tolerate malformed rels rows; the sheet lookup below throws
            // a descriptive error if a referenced rId never resolved
            if (id != null && target != null)
              b += id -> ("xl/" + target.stripPrefix("/xl/").stripPrefix("./"))
          }
        }
      } finally r.close()
      b.result()
    }.getOrElse(Map.empty)
    sheets.zipWithIndex.map { case ((name, rid), i) =>
      val part = rels.get(rid).flatMap(parts.get)
        .orElse(parts.get(s"xl/worksheets/sheet${i + 1}.xml"))
        .getOrElse(throw new IllegalArgumentException(s"worksheet part for '$name' missing"))
      XlsxSheet(name, parseWorksheet(part, shared))
    }
  }

  // ---------------------------------------------------------------- docx read

  /** One body-order element of a word-processing part: free text or a
    * table. The reference's layout-analysis path renders document tables
    * to markdown before chunking (tools/doc_intelligence.py:88-198); the
    * local decode path preserves the same structure instead of flattening
    * cell text into paragraphs.
    */
  sealed trait DocBlock
  final case class DocPara(text: String) extends DocBlock
  final case class DocTable(rows: Seq[Seq[String]]) extends DocBlock

  /** Walk one XML part into body-order blocks. WordprocessingML (w:) and
    * DrawingML (a:, used by pptx slides and graphicFrame tables) share the
    * local names p/tbl/tr/tc/t, so a single walker serves both formats.
    * Nested tables (depth > 1) flatten into the enclosing cell's text;
    * cell paragraphs join with newlines (markdown rendering collapses
    * whitespace per cell anyway).
    */
  private def parseBlocks(part: Array[Byte]): Seq[DocBlock] = {
    val r = reader(part)
    val out = Seq.newBuilder[DocBlock]
    var tblDepth = 0
    var rows: scala.collection.mutable.ArrayBuffer[Seq[String]] = null
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellParas: scala.collection.mutable.ArrayBuffer[String] = null
    val cur = new StringBuilder
    var inP = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "tbl" =>
              tblDepth += 1
              if (tblDepth == 1) rows = scala.collection.mutable.ArrayBuffer.empty
            case "tr" if tblDepth == 1 =>
              row = scala.collection.mutable.ArrayBuffer.empty
            case "tc" if tblDepth == 1 =>
              cellParas = scala.collection.mutable.ArrayBuffer.empty
            case "p" => inP = true; cur.clear()
            case "t" if inP => inT = true
            case "tab" if inP => cur.append('\t')
            case ("br" | "cr") if inP => cur.append('\n')
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "t" => inT = false
            case "p" if inP =>
              inP = false
              if (tblDepth == 0) out += DocPara(cur.toString)
              else if (cellParas != null) cellParas += cur.toString
            case "tc" if tblDepth == 1 && row != null && cellParas != null =>
              row += cellParas.filter(_.nonEmpty).mkString("\n")
              cellParas = null
            case "tr" if tblDepth == 1 && rows != null && row != null =>
              rows += row.toSeq; row = null
            case "tbl" =>
              if (tblDepth == 1 && rows != null) {
                out += DocTable(rows.toSeq); rows = null
              }
              tblDepth -= 1
            case _ =>
          }
          case _ =>
        }
      }
    } finally r.close()
    out.result()
  }

  /** Blocks → text: paragraphs verbatim, tables as GitHub markdown (first
    * row is the header — the same renderer contract as the spreadsheet
    * path, [[graft.pipeline.Spreadsheet.toMarkdown]] / x9_md_table).
    */
  private def renderBlocks(bs: Seq[DocBlock]): String =
    bs.flatMap {
      case DocPara(t) => if (t.nonEmpty) Some(t) else None
      case DocTable(rows) =>
        if (rows.isEmpty) None
        else Some(graft.pipeline.Spreadsheet.toMarkdown(
          graft.pipeline.Spreadsheet.Sheet("", rows.head, rows.drop(1))))
    }.mkString("\n")

  /** Decode a docx payload into its paragraph texts (tables flattened —
    * cell paragraphs appear in document order; [[readDocxBlocks]] keeps
    * the structure).
    */
  def readDocxParagraphs(bytes: Array[Byte]): Seq[String] =
    groupedText(zipEntries(bytes)("word/document.xml"), "p", "t")

  /** Decode a docx payload into body-order paragraph/table blocks. */
  def readDocxBlocks(bytes: Array[Byte]): Seq[DocBlock] =
    parseBlocks(zipEntries(bytes)("word/document.xml"))

  /** Full document text: paragraphs joined by newlines, blanks dropped,
    * tables rendered as markdown in body position.
    */
  def docxText(bytes: Array[Byte]): String =
    renderBlocks(readDocxBlocks(bytes))

  // ---------------------------------------------------------------- pptx read

  /** Decode a pptx payload into slides (each a list of paragraph texts),
    * presentation order preserved: `ppt/presentation.xml`'s `sldIdLst`
    * gives the slide sequence by relationship id, resolved through the
    * presentation rels part — slide part NAMES carry no ordering guarantee.
    * Falls back to numeric part-name order when either part is absent.
    * Slide text lives in DrawingML `a:p`/`a:r`/`a:t`, the same local names
    * docx uses, so the shared StAX walker applies unchanged.
    */
  def readPptxSlides(bytes: Array[Byte]): Seq[Seq[String]] =
    slidePartsInOrder(bytes).map(groupedText(_, "p", "t"))

  /** Slide part payloads in presentation order (see [[readPptxSlides]]). */
  private def slidePartsInOrder(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val parts = zipEntries(bytes)
    val orderedRids = parts.get("ppt/presentation.xml").map { p =>
      val r = reader(p)
      val b = Seq.newBuilder[String]
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sldId") {
            // the slide-number `id` attr is unprefixed (empty namespace);
            // the relationship pointer `r:id` is the namespaced one
            (0 until r.getAttributeCount)
              .find { i =>
                val ns = r.getAttributeNamespace(i)
                r.getAttributeLocalName(i) == "id" && ns != null && ns.nonEmpty
              }
              .foreach(i => b += r.getAttributeValue(i))
          }
        }
      } finally r.close()
      b.result()
    }.getOrElse(Seq.empty)
    val rels: Map[String, String] = parts.get("ppt/_rels/presentation.xml.rels").map { p =>
      val r = reader(p)
      val b = Map.newBuilder[String, String]
      try {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
            // tolerate malformed rels rows (missing Id/Target) here; strict
            // resolution below reports the rId that fails to resolve
            val id = r.getAttributeValue(null, "Id")
            val target = r.getAttributeValue(null, "Target")
            if (id != null && target != null)
              b += id -> ("ppt/" + target.stripPrefix("/ppt/").stripPrefix("./"))
          }
        }
      } finally r.close()
      b.result()
    }.getOrElse(Map.empty)
    val slideRe = """ppt/slides/slide(\d+)\.xml""".r
    if (orderedRids.nonEmpty)
      // strict: a listed slide that fails to resolve must throw, not
      // silently drop content (same contract as readXlsx's sheet lookup)
      orderedRids.map(rid => rels.get(rid).flatMap(parts.get).getOrElse(
        throw new IllegalArgumentException(s"slide part for '$rid' missing")))
    else parts.keysIterator.collect { case k @ slideRe(n) => (n.toInt, k) }
      .toSeq.sortBy(_._1).map(e => parts(e._2))
  }

  /** Decode a pptx payload into per-slide block lists: text-box paragraphs
    * as [[DocPara]]s, `graphicFrame` DrawingML tables as [[DocTable]]s.
    */
  def readPptxSlideBlocks(bytes: Array[Byte]): Seq[Seq[DocBlock]] =
    slidePartsInOrder(bytes).map(parseBlocks)

  /** Full deck text: paragraphs joined by newlines within a slide, slides
    * separated by blank lines, empty paragraphs dropped, tables rendered
    * as markdown in slide position.
    */
  def pptxText(bytes: Array[Byte]): String =
    readPptxSlideBlocks(bytes).map(renderBlocks)
      .filter(_.nonEmpty).mkString("\n\n")

  // ------------------------------------------------------------ fixture write

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def zip(entries: Seq[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(UTF_8))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private val numberRe = """-?\d+(\.\d+)?""".r

  /** Minimal spec-conformant xlsx writer (shared strings + numeric cells). */
  def writeXlsx(sheets: Seq[XlsxSheet]): Array[Byte] = {
    val strings = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int = strings.getOrElseUpdate(s, strings.size)
    def colRef(c: Int): String = {
      var n = c + 1
      val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheetXml = sheets.map { sh =>
      val rows = sh.rows.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex.filter(_._1.nonEmpty).map { case (cell, ci) =>
          val ref = s"${colRef(ci)}${ri + 1}"
          if (numberRe.matches(cell)) s"""<c r="$ref"><v>$cell</v></c>"""
          else s"""<c r="$ref" t="s"><v>${sharedIdx(cell)}</v></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rows</sheetData></worksheet>""".stripMargin
    }
    val wbSheets = sheets.zipWithIndex.map { case (sh, i) =>
      s"""<sheet name="${xmlEscape(sh.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    val ssItems = strings.keysIterator
      .map(s => s"<si><t>${xmlEscape(s)}</t></si>").mkString
    val overrides = sheets.indices.map { i =>
      s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
    }.mkString
    zip(
      Seq(
        "[Content_Types].xml" ->
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>$overrides</Types>""".stripMargin,
        "_rels/.rels" ->
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin,
        "xl/workbook.xml" ->
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$wbSheets</sheets></workbook>""".stripMargin,
        "xl/_rels/workbook.xml.rels" ->
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""".stripMargin,
        "xl/sharedStrings.xml" ->
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">$ssItems</sst>""".stripMargin
      ) ++ sheets.indices.map(i => s"xl/worksheets/sheet${i + 1}.xml" -> sheetXml(i))
    )
  }

  /** Minimal spec-conformant pptx writer (one text box per slide, one run
    * per paragraph). The sldIdLst is written in the given slide order, so
    * round-trips exercise the rels-based ordering path of the reader.
    */
  def writePptx(slides: Seq[Seq[String]]): Array[Byte] =
    writePptxBlocks(slides.map(_.map(DocPara(_): DocBlock)))

  /** Block-level pptx writer: text boxes plus real `p:graphicFrame`
    * DrawingML tables (ECMA-376 a:tbl/a:tr/a:tc), one shape per block.
    */
  def writePptxBlocks(slides: Seq[Seq[DocBlock]]): Array[Byte] = {
    val slideXml = slides.map { blocks =>
      val body = blocks.map {
        case DocPara(p) =>
          s"""<p:sp><p:txBody><a:p><a:r><a:t>${xmlEscape(p)}</a:t></a:r></a:p></p:txBody></p:sp>"""
        case DocTable(rows) =>
          val trs = rows.map(r => "<a:tr>" + r.map(c =>
            s"""<a:tc><a:txBody><a:p><a:r><a:t>${xmlEscape(c)}</a:t></a:r></a:p></a:txBody></a:tc>""").mkString +
            "</a:tr>").mkString
          s"""<p:graphicFrame><a:graphic><a:graphicData uri="http://schemas.openxmlformats.org/drawingml/2006/table"><a:tbl>$trs</a:tbl></a:graphicData></a:graphic></p:graphicFrame>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"><p:cSld><p:spTree>$body</p:spTree></p:cSld></p:sld>""".stripMargin
    }
    val sldIds = slides.indices.map { i =>
      s"""<p:sldId id="${256 + i}" r:id="rId${i + 1}"/>"""
    }.mkString
    val rels = slides.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide" Target="slides/slide${i + 1}.xml"/>"""
    }.mkString
    val overrides = slides.indices.map { i =>
      s"""<Override PartName="/ppt/slides/slide${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>"""
    }.mkString
    zip(
      Seq(
        "[Content_Types].xml" ->
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>$overrides</Types>""".stripMargin,
        "_rels/.rels" ->
          """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
            |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/></Relationships>""".stripMargin,
        "ppt/presentation.xml" ->
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><p:sldIdLst>$sldIds</p:sldIdLst></p:presentation>""".stripMargin,
        "ppt/_rels/presentation.xml.rels" ->
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>""".stripMargin
      ) ++ slides.indices.map(i => s"ppt/slides/slide${i + 1}.xml" -> slideXml(i))
    )
  }

  /** Minimal spec-conformant docx writer (one run per paragraph). */
  def writeDocx(paragraphs: Seq[String]): Array[Byte] =
    writeDocxBlocks(paragraphs.map(DocPara))

  private def docxTableXml(rows: Seq[Seq[String]]): String =
    rows.map(r => "<w:tr>" + r.map(c =>
      s"""<w:tc><w:p><w:r><w:t xml:space="preserve">${xmlEscape(c)}</w:t></w:r></w:p></w:tc>""").mkString +
      "</w:tr>").mkString("<w:tbl>", "", "</w:tbl>")

  /** Body-order docx writer: paragraphs and real `w:tbl` tables, so table
    * fixtures exercise the structured read path end-to-end.
    */
  def writeDocxBlocks(blocks: Seq[DocBlock]): Array[Byte] = {
    val body = blocks.map {
      case DocPara(p) =>
        s"""<w:p><w:r><w:t xml:space="preserve">${xmlEscape(p)}</w:t></w:r></w:p>"""
      case DocTable(rows) => docxTableXml(rows)
    }.mkString
    zip(Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>""".stripMargin,
      "word/document.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>$body</w:body></w:document>""".stripMargin
    ))
  }
}
