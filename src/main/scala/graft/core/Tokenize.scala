package graft.core

/** Token counting (SURVEY §2.8 X5). The reference counts tokens with a BPE
  * tokenizer (tiktoken, /root/reference/tools/aoai.py:266-276); chunk
  * boundaries depend on it. We keep the tokenizer pluggable behind a trait and
  * ship a deterministic BPE-ish regex tokenizer: letter runs, digit runs, and
  * single non-alphanumeric marks — a public, language-agnostic approximation
  * with the same asymptotics (len/token ≈ 4 for English prose).
  */
trait Tokenizer extends Serializable {
  def tokens(s: String): Array[String]
  def count(s: String): Int = if (s == null || s.isEmpty) 0 else tokens(s).length
}

/** Word-ish tokens: unicode letter runs | digit runs | single marks. */
object RegexTokenizer extends Tokenizer {
  private val pat = java.util.regex.Pattern.compile("""\p{L}+|\p{N}+|[^\s\p{L}\p{N}]""")
  override def tokens(s: String): Array[String] = {
    if (s == null || s.isEmpty) return Array.empty
    val m = pat.matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }
  // Counting without materializing tokens (hot path for splitters).
  override def count(s: String): Int = {
    if (s == null || s.isEmpty) return 0
    val m = pat.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }
}

/** Plain whitespace tokenizer (used for stopword/quality stats). */
object WhitespaceTokenizer extends Tokenizer {
  override def tokens(s: String): Array[String] =
    if (s == null || s.trim.isEmpty) Array.empty else s.trim.split("\\s+")
}
