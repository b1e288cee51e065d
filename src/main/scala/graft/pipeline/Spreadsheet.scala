package graft.pipeline

import graft.core.{RegexTokenizer, Tokenizer}
import graft.services.Summarizer

/** Spreadsheet chunking (SURVEY §2.9 C3, §2.8 X9/X10; behavior spec:
  * /root/reference/chunking/chunkers/spreadsheet_chunker.py:71-376).
  *
  * Two modes over parsed rows:
  *  - sheet mode: render one markdown table per sheet; if it exceeds the
  *    token cap, substitute the (pluggable) summary (A6);
  *  - row mode: one chunk per non-empty row (F7), with a compact
  *    `file=… sheet=… row=… cols=h1|h2 vals=v1|v2` embedding text (X10),
  *    trailing empty columns trimmed.
  * The xlsx byte decode is an external seam; tests drive CSV text.
  */
object Spreadsheet {

  final case class Sheet(name: String, header: Seq[String], rows: Seq[Seq[String]])

  /** Minimal CSV text → Sheet (quote-free synthetic fixtures). */
  def parseCsv(name: String, csv: String, hasHeader: Boolean = true): Sheet = {
    val lines = csv.split("\r?\n").toSeq.filter(_.nonEmpty)
    if (lines.isEmpty) return Sheet(name, Seq.empty, Seq.empty)
    val cells = lines.map(_.split(",", -1).toSeq.map(_.trim))
    if (hasHeader) Sheet(name, cells.head, cells.tail)
    else Sheet(name, cells.head.indices.map(i => s"col$i"), cells)
  }

  /** X9: GitHub-style markdown table; cell whitespace collapsed. */
  def toMarkdown(sheet: Sheet): String = {
    def clean(c: String) = c.replaceAll("\\s+", " ").trim
    val head = sheet.header.map(clean).mkString("| ", " | ", " |")
    val sep = sheet.header.map(_ => "---").mkString("| ", " | ", " |")
    val rows = sheet.rows.map(r => r.map(clean).mkString("| ", " | ", " |"))
    (Seq(head, sep) ++ rows).mkString("\n")
  }

  /** F7: a row counts when any cell is non-blank. */
  def nonEmpty(row: Seq[String]): Boolean = row.exists(_.trim.nonEmpty)

  /** X10: compact row text for embedding; trailing empty columns trimmed. */
  def rowText(file: String, sheet: String, rowIdx: Int,
      header: Seq[String], row: Seq[String]): String = {
    val lastNonEmpty = row.lastIndexWhere(_.trim.nonEmpty)
    val h = header.take(lastNonEmpty + 1)
    val v = row.take(lastNonEmpty + 1)
    s"file=$file sheet=$sheet row=$rowIdx cols=${h.mkString("|")} vals=${v.mkString("|")}"
  }

  /** Sheet mode (A6): markdown table, or its summary when above the cap. */
  def sheetChunk(file: String, sheet: Sheet, maxTokens: Int,
      summarizer: Summarizer, tok: Tokenizer = RegexTokenizer): (String, Boolean) = {
    val md = toMarkdown(sheet)
    if (tok.count(md) > maxTokens) (summarizer.summarize(md), true) else (md, false)
  }

  /** Row mode: one compact chunk per non-empty row (streaming-iterator
    * friendly — the caller gets a lazy iterator, matching the reference's
    * `iter_chunks` generator).
    */
  def rowChunks(file: String, sheet: Sheet): Iterator[String] =
    sheet.rows.iterator.zipWithIndex
      .filter { case (r, _) => nonEmpty(r) }
      .map { case (r, i) => rowText(file, sheet.name, i + 1, sheet.header, r) }
}
