package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.services.LeadingSentencesSummarizer

class SpreadsheetSpec extends AnyFunSuite {
  private val csv = "name,qty,price\nwidget,2,9.99\n , , \ngadget,5,19.50"
  private val sheet = Spreadsheet.parseCsv("Sheet1", csv)

  test("csv parse: header + rows") {
    assert(sheet.header == Seq("name", "qty", "price"))
    assert(sheet.rows.length == 3)
  }

  test("markdown render (X9): header, separator, cleaned cells") {
    val md = Spreadsheet.toMarkdown(sheet)
    val lines = md.split("\n")
    assert(lines(0) == "| name | qty | price |")
    assert(lines(1) == "| --- | --- | --- |")
    assert(lines(2) == "| widget | 2 | 9.99 |")
  }

  test("row mode skips blank rows (F7) and emits compact text (X10)") {
    val chunks = Spreadsheet.rowChunks("book.xlsx", sheet).toSeq
    assert(chunks.length == 2) // blank row dropped
    assert(chunks.head ==
      "file=book.xlsx sheet=Sheet1 row=1 cols=name|qty|price vals=widget|2|9.99")
    assert(chunks(1).contains("row=3"))
  }

  test("trailing empty columns trimmed in row text (X10)") {
    val s = Spreadsheet.Sheet("S", Seq("a", "b", "c"), Seq(Seq("x", "", "")))
    val t = Spreadsheet.rowText("f", "S", 1, s.header, s.rows.head)
    assert(t == "file=f sheet=S row=1 cols=a vals=x")
  }

  test("sheet mode substitutes summary above the token cap (A6)") {
    val (small, sub1) = Spreadsheet.sheetChunk("f", sheet, maxTokens = 10000,
      new LeadingSentencesSummarizer(1))
    assert(!sub1 && small.startsWith("| name |"))
    val (summed, sub2) = Spreadsheet.sheetChunk("f", sheet, maxTokens = 3,
      new LeadingSentencesSummarizer(1, maxChars = 40))
    assert(sub2)
    assert(summed.length <= 40)
  }
}
