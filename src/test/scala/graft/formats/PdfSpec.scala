package graft.formats

import org.scalatest.funsuite.AnyFunSuite

/** Minimal PDF text extraction (S13): content-stream location, FlateDecode,
  * literal/hex show operators, escape handling.
  */
class PdfSpec extends AnyFunSuite {

  test("round-trip: compressed and raw content streams extract the lines") {
    val lines = Seq("Quarterly results", "Revenue up 12% (estimate)")
    assert(Pdf.extractText(Pdf.writePdf(lines, compress = true)) == lines.mkString("\n"))
    assert(Pdf.extractText(Pdf.writePdf(lines, compress = false)) == lines.mkString("\n"))
  }

  test("string escapes: parens, backslash, octal, line continuation") {
    val tricky = Seq("""nested (parens) survive""", """back\slash and close)""")
    assert(Pdf.extractText(Pdf.writePdf(tricky)) == tricky.mkString("\n"))
    // hand-built stream with octal + continuation + hex string
    val content = "BT (A\\101\\n) Tj (cont\\\ninued) Tj T* <48656C6C6F> Tj ET"
      .getBytes("ISO-8859-1")
    assert(Pdf.streamText(content) == "AA\n" + "continued\nHello")
  }

  test("compact streams: literal or hex immediately after an operator") {
    // no whitespace between BT/Tj and the string opener — common in
    // minimal generators; the operator skip must not swallow the '(' / '<'
    assert(Pdf.streamText("BT(Hi) Tj ET".getBytes("ISO-8859-1")) == "Hi")
    assert(Pdf.streamText("BT<4869>Tj ET".getBytes("ISO-8859-1")) == "Hi")
  }

  test("a FlateDecode stream demanding a preset dictionary is skipped, not a hang") {
    // zlib header 0x78 0xBB has FDICT set; Inflater stalls needing the dict
    val data = Array[Byte](0x78.toByte, 0xBB.toByte, 1, 2, 3, 4, 5, 6)
    val pdf = (s"1 0 obj\n<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n"
      .getBytes("ISO-8859-1") ++ data ++ "\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    assert(Pdf.extractText(pdf) == "")
  }

  test("streams with unknown filters are skipped, not errors") {
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length 3 /Filter /DCTDecode >>\n" +
      "stream\n\nendstream\nendobj\n" +
      "2 0 obj\n<< /Length 20 >>\nstream\nBT (kept text) Tj ET\nendstream\nendobj\n")
      .getBytes("ISO-8859-1")
    assert(Pdf.extractText(pdf) == "kept text")
  }

  test("'stream' bytes inside binary data do not desync the scanner") {
    // compressed payload engineered to contain the word "stream": the
    // well-framed ">> stream" requirement must skip the false positive
    val lines = Seq("x" * 40, "stream endstream stream", "tail line")
    assert(Pdf.extractText(Pdf.writePdf(lines, compress = false)) == lines.mkString("\n"))
  }

  test("multi-page writer: page count and per-page text round-trip") {
    val pages = (1 to 5).map(p => Seq(s"page $p line one", s"page $p line two"))
    val pdf = Pdf.writePdfPages(pages)
    assert(Pdf.pageCount(pdf) == 5)
    assert(Pdf.extractText(pdf) ==
      pages.map(_.mkString("\n")).mkString("\n"))
  }

  test("splitByPages: part page counts sum; concatenated text equals the whole") {
    val pages = (1 to 7).map(p => Seq(s"p$p alpha", s"p$p beta"))
    val whole = Pdf.writePdfPages(pages)
    val parts = Pdf.splitByPages(whole, maxPages = 3)
    assert(parts.length == 3)
    assert(parts.map(Pdf.pageCount) == Seq(3, 3, 1))
    assert(parts.map(Pdf.pageCount).sum == Pdf.pageCount(whole))
    // text of the concatenated parts == text of the whole document
    assert(parts.map(Pdf.extractText).mkString("\n") == Pdf.extractText(whole))
    // each part is a well-formed standalone PDF: header, self-consistent
    // xref offsets, and one /Pages node counting its pages
    parts.zipWithIndex.foreach { case (part, pi) =>
      val str = new String(part, "ISO-8859-1")
      assert(str.startsWith("%PDF-"))
      val declared = str.substring(str.lastIndexOf("startxref")).split("\n")(1).trim.toInt
      assert(str.startsWith("xref", declared), s"part $pi startxref wrong")
      val entries = str.substring(declared).split("\n").drop(3).takeWhile(_.endsWith(" n "))
      entries.zipWithIndex.foreach { case (e, i) =>
        val off = e.split(" ")(0).toInt
        assert(str.startsWith(s"${i + 1} 0 obj", off), s"part $pi object ${i + 1} offset wrong")
      }
    }
  }

  test("splitByPages: at-or-under-limit documents come back whole and byte-identical") {
    val whole = Pdf.writePdfPages((1 to 3).map(p => Seq(s"page $p")))
    val parts = Pdf.splitByPages(whole, maxPages = 5)
    assert(parts.length == 1)
    assert(parts.head.toSeq == whole.toSeq)
  }

  test("splitByPages: compressed payloads survive renumbering untouched") {
    // FlateDecode payload bytes may contain 'N 0 R' byte patterns; the ref
    // rewrite must skip payload spans, so decode-after-split stays exact
    val pages = (1 to 6).map(p => Seq(s"page $p " + ("R 0 7 " * 10)))
    val parts = Pdf.splitByPages(Pdf.writePdfPages(pages, compress = true), 2)
    assert(parts.length == 3)
    assert(parts.map(Pdf.extractText).mkString("\n") ==
      pages.map(_.mkString("\n")).mkString("\n"))
  }

  test("split → per-part analysis → continuous page renumbering (C1 flow)") {
    // the reference splits large PDFs, layout-analyzes each part (markers
    // come back unnumbered per part), then renumbers with cumulative page
    // offsets (file_utils.py:122-138). Drive the binary split + the
    // renumbering together over a 7-page document in 3-page parts.
    import graft.core.PageAttribution
    val pages = (1 to 7).map(p => Seq(s"page $p body text"))
    val parts = Pdf.splitByPages(Pdf.writePdfPages(pages), maxPages = 3)
    // per-part "analysis": one unnumbered marker ahead of each page's text
    val partMarkdown = parts.map { part =>
      Pdf.extractText(part).split("\n").map(l =>
        PageAttribution.RawMarker + "\n" + l).mkString("\n")
    }
    val whole = PageAttribution.renumberParts(partMarkdown)
    // markers run 00001..00007 continuously across part boundaries
    val numbers = """<!-- PageBreak(\d{5}) -->""".r
      .findAllMatchIn(whole).map(_.group(1).toInt).toSeq
    assert(numbers == (1 to 7), s"renumbering across parts broke: $numbers")
    // each page's text still follows its own (renumbered) marker
    (1 to 7).foreach { p =>
      val at = whole.indexOf(f"<!-- PageBreak$p%05d -->")
      val next = whole.indexOf("<!-- PageBreak", at + 1)
      val segment = if (next < 0) whole.substring(at) else whole.substring(at, next)
      assert(segment.contains(s"page $p body text"), s"page $p text not under its marker")
    }
  }

  test("splitByPages: attributes inherited from the /Pages node survive the split") {
    // real-world generators commonly hoist /Resources and /MediaBox onto the
    // /Pages node (PDF 32000-1 §7.7.3.4 inheritance); a split part that
    // drops them has pages with no fonts and no page size. Hand-build such
    // a document: pages define neither, one page overrides /Rotate.
    val sb = new StringBuilder
    def obj(n: Int, body: String): Unit =
      sb.append(s"$n 0 obj\n$body\nendobj\n")
    sb.append("%PDF-1.4\n")
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R 4 0 R 5 0 R 6 0 R] /Count 4 " +
      "/MediaBox [0 0 612 792] /Rotate 0 " +
      "/Resources << /Font << /F1 11 0 R >> >> >>")
    (0 until 4).foreach { i =>
      val rotate = if (i == 0) " /Rotate 90" else ""
      obj(3 + i, s"<< /Type /Page /Parent 2 0 R /Contents ${7 + i} 0 R$rotate >>")
    }
    (0 until 4).foreach { i =>
      val content = s"BT /F1 12 Tf (page ${i + 1}) Tj ET"
      obj(7 + i, s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    }
    obj(11, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val whole = sb.toString.getBytes("ISO-8859-1")
    assert(Pdf.pageCount(whole) == 4)

    val parts = Pdf.splitByPages(whole, maxPages = 2)
    assert(parts.map(Pdf.pageCount) == Seq(2, 2))
    assert(parts.map(Pdf.extractText).mkString("\n") == Pdf.extractText(whole))
    parts.zipWithIndex.foreach { case (part, pi) =>
      val str = new String(part, "ISO-8859-1")
      // every page carries the media box it used to inherit
      assert("/MediaBox \\[0 0 612 792\\]".r.findAllIn(str).length == 2,
        s"part $pi lost the inherited /MediaBox")
      // the font referenced via the inherited /Resources was copied over
      assert(str.contains("/BaseFont /Helvetica"), s"part $pi lost the font")
      assert("/Resources".r.findAllIn(str).length == 2,
        s"part $pi pages missing inherited /Resources")
    }
    // the page-level /Rotate 90 override wins over the tree's /Rotate 0
    val first = new String(parts.head, "ISO-8859-1")
    assert(first.contains("/Rotate 90"))
    assert("/Rotate 0\\b".r.findAllIn(first).length == 1,
      "page without override should inherit /Rotate 0 exactly once")
  }

  test("xref offsets are self-consistent (external readers can seek)") {
    val pdf = new String(Pdf.writePdf(Seq("hi")), "ISO-8859-1")
    val xrefAt = pdf.lastIndexOf("startxref")
    val declared = pdf.substring(xrefAt).split("\n")(1).trim.toInt
    assert(pdf.startsWith("xref", declared), "startxref must point at the xref table")
    // each 20-byte entry must point at "N 0 obj"
    val entries = pdf.substring(declared).split("\n").drop(3).takeWhile(_.endsWith(" n "))
    entries.zipWithIndex.foreach { case (e, i) =>
      val off = e.split(" ")(0).toInt
      assert(pdf.startsWith(s"${i + 1} 0 obj", off), s"object ${i + 1} offset wrong")
    }
  }
}
