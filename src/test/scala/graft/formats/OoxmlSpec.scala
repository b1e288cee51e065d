package graft.formats

import org.scalatest.funsuite.AnyFunSuite

/** Real OOXML container decode (S13): zip + sheet XML + shared strings for
  * xlsx, document XML paragraphs for docx. Round-trips through the fixture
  * writers plus hand-built parts for the shapes the writer doesn't emit
  * (inline strings, missing cell refs, rich-text runs).
  */
class OoxmlSpec extends AnyFunSuite {

  test("xlsx round-trip: sheets, order, strings vs numbers, sparse cells") {
    val sheets = Seq(
      Ooxml.XlsxSheet("Sales", Seq(
        Seq("region", "amount", "note"),
        Seq("east", "100", "ok & fine"),
        Seq("west", "250.5", "<quoted>"))),
      Ooxml.XlsxSheet("Empty", Seq.empty),
      Ooxml.XlsxSheet("Gaps", Seq(
        Seq("a", "", "c")))) // empty middle cell → skipped by writer, padded by reader
    val back = Ooxml.readXlsx(Ooxml.writeXlsx(sheets))
    assert(back.map(_.name) == Seq("Sales", "Empty", "Gaps"))
    assert(back.head.rows == sheets.head.rows)
    assert(back(1).rows.isEmpty)
    assert(back(2).rows == Seq(Seq("a", "", "c")))
  }

  test("xlsx cell references: column letters decode, gaps become empty cells") {
    assert(Ooxml.columnIndex("A1") == 0)
    assert(Ooxml.columnIndex("Z9") == 25)
    assert(Ooxml.columnIndex("AA10") == 26)
    assert(Ooxml.columnIndex("AB3") == 27)
  }

  test("xlsx inline strings and rich-text shared strings parse") {
    // hand-built worksheet with an inlineStr cell and a rich-text <si>
    // (multiple <r><t> runs) — shapes real producers emit that the fixture
    // writer doesn't
    val sst = """<?xml version="1.0"?>
      |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="1" uniqueCount="1">
      |<si><r><t>rich </t></r><r><t>text</t></r></si></sst>""".stripMargin
    val ws = """<?xml version="1.0"?>
      |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
      |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="inlineStr"><is><t>inline!</t></is></c></row>
      |</sheetData></worksheet>""".stripMargin
    val wb = """<?xml version="1.0"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    Seq("xl/workbook.xml" -> wb, "xl/sharedStrings.xml" -> sst,
      "xl/worksheets/sheet1.xml" -> ws).foreach { case (n, c) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    zos.close()
    val back = Ooxml.readXlsx(bos.toByteArray)
    // A1 = both rich runs concatenated, B1 missing → "", C1 inline
    assert(back.head.rows == Seq(Seq("rich text", "", "inline!")))
  }

  test("docx round-trip: paragraphs, escapes, blank filtering") {
    val paras = Seq("Heading", "Body with naïve café & <tags>", "", "tail")
    val bytes = Ooxml.writeDocx(paras)
    assert(Ooxml.readDocxParagraphs(bytes) == paras)
    assert(Ooxml.docxText(bytes) == "Heading\nBody with naïve café & <tags>\ntail")
  }

  test("pptx round-trip: slides, paragraph order, escapes, blank filtering") {
    val slides = Seq(
      Seq("Agenda", "Q3 targets & risks"),
      Seq("Summary <slide>", "", "Next steps"))
    val bytes = Ooxml.writePptx(slides)
    assert(Ooxml.readPptxSlides(bytes) == slides)
    assert(Ooxml.pptxText(bytes) ==
      "Agenda\nQ3 targets & risks\n\nSummary <slide>\nNext steps")
  }

  test("pptx slide order follows sldIdLst, not part-name order") {
    // build a deck whose rels point rId1 → slide2.xml and rId2 → slide1.xml,
    // so list order and numeric part order disagree
    val base = Ooxml.writePptx(Seq(Seq("first"), Seq("second")))
    val parts = Ooxml.zipEntries(base)
    val swapped = parts.map {
      case ("ppt/_rels/presentation.xml.rels", _) =>
        "ppt/_rels/presentation.xml.rels" ->
          ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
            """<Relationship Id="rId1" Type="t" Target="slides/slide2.xml"/>""" +
            """<Relationship Id="rId2" Type="t" Target="slides/slide1.xml"/>""" +
            """</Relationships>""").getBytes("UTF-8")
      case kv => kv
    }
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    swapped.foreach { case (name, body) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body)
      zos.closeEntry()
    }
    zos.close()
    assert(Ooxml.readPptxSlides(bos.toByteArray) == Seq(Seq("second"), Seq("first")))
  }

  test("pptx with a listed slide that fails to resolve throws, not drops") {
    val base = Ooxml.writePptx(Seq(Seq("first"), Seq("second")))
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    Ooxml.zipEntries(base).foreach { case (name, body) =>
      if (name != "ppt/slides/slide2.xml") { // drop a listed slide part
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(body)
        zos.closeEntry()
      }
    }
    zos.close()
    val e = intercept[IllegalArgumentException](Ooxml.readPptxSlides(bos.toByteArray))
    assert(e.getMessage.contains("rId2"))
  }

  test("pptx → chunking dispatch extracts deck text") {
    val bytes = Ooxml.writePptx(Seq(Seq("Title"), Seq("Point one")))
    assert(graft.pipeline.Chunkers.extractText(bytes, "pptx") == "Title\n\nPoint one")
  }

  test("docx tables render as markdown in body position") {
    val blocks = Seq(
      Ooxml.DocPara("Intro paragraph"),
      Ooxml.DocTable(Seq(
        Seq("item", "qty"),
        Seq("bolts", "12"),
        Seq("nuts & washers", "7"))),
      Ooxml.DocPara("Closing"))
    val bytes = Ooxml.writeDocxBlocks(blocks)
    // structured read preserves body order and table shape
    assert(Ooxml.readDocxBlocks(bytes) == blocks)
    assert(Ooxml.docxText(bytes) ==
      "Intro paragraph\n" +
      "| item | qty |\n| --- | --- |\n| bolts | 12 |\n| nuts & washers | 7 |\n" +
      "Closing")
    // the legacy flat reader still sees every paragraph, cells included
    assert(Ooxml.readDocxParagraphs(bytes) ==
      Seq("Intro paragraph", "item", "qty", "bolts", "12",
        "nuts & washers", "7", "Closing"))
  }

  test("docx multi-paragraph cells and nested tables flatten into the cell") {
    // hand-built: a cell with two paragraphs, and a nested table inside
    // the second cell — nested structure flattens into that cell's text
    val doc = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>
      |<w:tbl><w:tr>
      |<w:tc><w:p><w:r><w:t>line1</w:t></w:r></w:p><w:p><w:r><w:t>line2</w:t></w:r></w:p></w:tc>
      |<w:tc><w:p><w:r><w:t>outer</w:t></w:r></w:p>
      |<w:tbl><w:tr><w:tc><w:p><w:r><w:t>inner</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
      |</w:tc>
      |</w:tr></w:tbl>
      |</w:body></w:document>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    zos.write(doc.getBytes("UTF-8")); zos.closeEntry(); zos.close()
    assert(Ooxml.readDocxBlocks(bos.toByteArray) ==
      Seq(Ooxml.DocTable(Seq(Seq("line1\nline2", "outer\ninner")))))
  }

  test("pptx graphicFrame tables round-trip and render as markdown") {
    val slides = Seq(
      Seq[Ooxml.DocBlock](Ooxml.DocPara("Metrics")),
      Seq[Ooxml.DocBlock](
        Ooxml.DocPara("Quarter summary"),
        Ooxml.DocTable(Seq(Seq("q", "rev"), Seq("Q1", "10"), Seq("Q2", "12")))))
    val bytes = Ooxml.writePptxBlocks(slides)
    assert(Ooxml.readPptxSlideBlocks(bytes) == slides)
    assert(Ooxml.pptxText(bytes) ==
      "Metrics\n\nQuarter summary\n" +
      "| q | rev |\n| --- | --- |\n| Q1 | 10 |\n| Q2 | 12 |")
  }

  test("xlsx → chunking dispatch renders markdown tables per sheet") {
    val bytes = Ooxml.writeXlsx(Seq(Ooxml.XlsxSheet("T",
      Seq(Seq("h1", "h2"), Seq("v1", "v2")))))
    val text = graft.pipeline.Chunkers.extractText(bytes, "xlsx")
    assert(text == "# T\n| h1 | h2 |\n| --- | --- |\n| v1 | v2 |")
  }
}
