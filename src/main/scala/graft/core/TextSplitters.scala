package graft.core

import scala.collection.mutable.ArrayBuffer

/** Token-bounded text splitters (SURVEY §2.9 C1/C7).
  *
  * The reference splits layout markdown with LangChain's
  * MarkdownTextSplitter / RecursiveCharacterTextSplitter at 2048 tokens with
  * 200 overlap and drops chunks under 100 tokens
  * (/root/reference/chunking/chunkers/doc_analysis_chunker.py:287-320,
  * langchain_chunker.py:42-140). This is an independent reimplementation of
  * the public recursive-split algorithm: find the coarsest separator present,
  * split, recurse into oversized pieces with finer separators, then greedily
  * re-merge adjacent pieces up to the token budget keeping a token-bounded
  * overlap tail.
  */
final case class SplitParams(
    maxTokens: Int = 2048,
    overlapTokens: Int = 200,
    minChunkTokens: Int = 100,
    tokenizer: Tokenizer = Tokenize.default)

object TextSplitters {

  val plainSeparators: Seq[String] = Seq("\n\n", "\n", ". ", " ", "")
  val markdownSeparators: Seq[String] = Seq(
    "\n# ", "\n## ", "\n### ", "\n#### ", "\n##### ", "\n###### ",
    "```\n", "\n\n", "\n", " ", "")
  val sentenceSeparators: Seq[String] = Seq(". ", "! ", "? ", " ", "\n", "\t", "")

  /** Recursive token-bounded split; returns chunks in document order. */
  def recursiveSplit(text: String, p: SplitParams,
      separators: Seq[String] = plainSeparators): Seq[String] =
    if (text == null || text.isEmpty) Seq.empty
    else splitRec(text, p, separators).filter(_.trim.nonEmpty)

  def markdownSplit(text: String, p: SplitParams): Seq[String] =
    recursiveSplit(text, p, markdownSeparators)

  /** Split + enforce the min-chunk floor (F6). */
  def splitWithMin(text: String, p: SplitParams,
      separators: Seq[String] = plainSeparators): Seq[String] =
    recursiveSplit(text, p, separators).filter(c => p.tokenizer.count(c) >= p.minChunkTokens)

  private def splitRec(text: String, p: SplitParams, seps: Seq[String]): Seq[String] = {
    // Coarsest separator that occurs in the text ("" always matches last).
    val idx = seps.indexWhere(s => s.isEmpty || text.contains(s))
    val sep = if (idx < 0) "" else seps(idx)
    val rest = if (idx < 0) Seq.empty else seps.drop(idx + 1)

    val pieces: Seq[String] =
      if (sep.isEmpty) text.grouped(math.max(1, p.maxTokens)).toSeq
      else splitKeep(text, sep)

    val out = ArrayBuffer.empty[String]
    val pending = ArrayBuffer.empty[String] // small pieces awaiting merge
    def flush(): Unit = if (pending.nonEmpty) {
      out ++= merge(pending.toSeq, sep, p); pending.clear()
    }
    for (piece <- pieces) {
      if (p.tokenizer.count(piece) <= p.maxTokens) pending += piece
      else {
        flush()
        if (rest.isEmpty) out += piece
        else out ++= splitRec(piece, p, rest)
      }
    }
    flush()
    out.toSeq
  }

  /** Split on `sep`, the separator staying attached to the preceding piece, so
    * concatenation of pieces reproduces the input exactly.
    */
  private[core] def splitKeep(text: String, sep: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var start = 0
    var i = text.indexOf(sep)
    while (i >= 0) {
      out += text.substring(start, i + sep.length)
      start = i + sep.length
      i = text.indexOf(sep, start)
    }
    if (start < text.length) out += text.substring(start)
    out.toSeq
  }

  /** Greedy merge of small pieces up to maxTokens, retaining an overlap tail
    * of up to overlapTokens between consecutive chunks.
    */
  private def merge(pieces: Seq[String], sep: String, p: SplitParams): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val window = ArrayBuffer.empty[(String, Int)] // piece -> token count
    var total = 0
    def emit(): Unit = if (window.nonEmpty) {
      val chunk = window.map(_._1).mkString
      if (chunk.trim.nonEmpty) out += chunk
      // retain overlap tail
      while (total > p.overlapTokens || (window.nonEmpty && total > p.maxTokens)) {
        total -= window.head._2
        window.remove(0)
      }
    }
    for (piece <- pieces) {
      val n = p.tokenizer.count(piece)
      if (total + n > p.maxTokens && window.nonEmpty) {
        emit()
        // the retained overlap tail must still leave room for the incoming
        // piece — shed tail pieces until it does, else the next emitted
        // chunk would exceed the token budget
        while (window.nonEmpty && total + n > p.maxTokens) {
          total -= window.head._2
          window.remove(0)
        }
      }
      window += ((piece, n))
      total += n
    }
    if (window.nonEmpty) {
      val chunk = window.map(_._1).mkString
      if (chunk.trim.nonEmpty) out += chunk
    }
    out.toSeq
  }

  /** Fixed-size character chunker with overlap — the SQL-expressible analog
    * used by the `c1_chunk_fixed` correctness query (stride = size - overlap).
    */
  def fixedCharSplit(text: String, size: Int, overlap: Int): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val stride = math.max(1, size - overlap)
    (0 until text.length by stride).map(s => text.substring(s, math.min(text.length, s + size)))
  }
}
