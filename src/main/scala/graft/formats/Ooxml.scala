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

  /** Decode a docx payload into its paragraph texts. */
  def readDocxParagraphs(bytes: Array[Byte]): Seq[String] =
    groupedText(zipEntries(bytes)("word/document.xml"), "p", "t")

  /** Full document text: paragraphs joined by newlines, blanks dropped. */
  def docxText(bytes: Array[Byte]): String =
    readDocxParagraphs(bytes).filter(_.nonEmpty).mkString("\n")

  // ---------------------------------------------------------------- pptx read

  /** Decode a pptx payload into slides (each a list of paragraph texts),
    * presentation order preserved: `ppt/presentation.xml`'s `sldIdLst`
    * gives the slide sequence by relationship id, resolved through the
    * presentation rels part — slide part NAMES carry no ordering guarantee.
    * Falls back to numeric part-name order when either part is absent.
    * Slide text lives in DrawingML `a:p`/`a:r`/`a:t`, the same local names
    * docx uses, so the shared StAX walker applies unchanged.
    */
  def readPptxSlides(bytes: Array[Byte]): Seq[Seq[String]] = {
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
    val slideParts: Seq[Array[Byte]] =
      if (orderedRids.nonEmpty)
        // strict: a listed slide that fails to resolve must throw, not
        // silently drop content (same contract as readXlsx's sheet lookup)
        orderedRids.map(rid => rels.get(rid).flatMap(parts.get).getOrElse(
          throw new IllegalArgumentException(s"slide part for '$rid' missing")))
      else parts.keysIterator.collect { case k @ slideRe(n) => (n.toInt, k) }
        .toSeq.sortBy(_._1).map(e => parts(e._2))
    slideParts.map(groupedText(_, "p", "t"))
  }

  /** Full deck text: paragraphs joined by newlines within a slide, slides
    * separated by blank lines, empty paragraphs dropped.
    */
  def pptxText(bytes: Array[Byte]): String =
    readPptxSlides(bytes).map(_.filter(_.nonEmpty).mkString("\n"))
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
  def writePptx(slides: Seq[Seq[String]]): Array[Byte] = {
    val slideXml = slides.map { paras =>
      val body = paras.map(p =>
        s"""<a:p><a:r><a:t>${xmlEscape(p)}</a:t></a:r></a:p>""").mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"><p:cSld><p:spTree><p:sp><p:txBody>$body</p:txBody></p:sp></p:spTree></p:cSld></p:sld>""".stripMargin
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
  def writeDocx(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map(p =>
      s"""<w:p><w:r><w:t xml:space="preserve">${xmlEscape(p)}</w:t></w:r></w:p>""").mkString
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
