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

/** The deployment seam for exact-BPE token counting (SURVEY §7.4,
  * COVERAGE.md §2.8): when `-Dgraft.bpe.mergesPath=<file>` (or env
  * `GRAFT_BPE_MERGES`) points at a tiktoken-style rank file — e.g. the
  * public MIT cl100k artifact dropped next to the jar — every chunker and
  * truncation path that defaults to [[Tokenize.default]] counts with that
  * real BPE table, zero code change. Unset (this sandbox has no copy of
  * the artifact and no egress), the regex approximation stands in.
  *
  * Resolution happens in whichever JVM first touches the lazy val. Two
  * patterns keep driver and executors consistent:
  *  - PREFERRED: evaluate `Tokenize.default` in driver code and capture
  *    the instance in the closure (the tokenizer is Serializable, so
  *    executors receive the table in the task binary and never read the
  *    file) — `GraftFunctions.register` does exactly this for the SQL
  *    surface;
  *  - default-parameter call sites INSIDE closures resolve on each
  *    executor, so the deployment contract there is the standard
  *    node-local-artifact one (GeoIP-db style): the file AND the
  *    property/env must be present on EVERY node
  *    (`spark.executor.extraJavaOptions=-Dgraft.bpe.mergesPath=…` or
  *    `spark.executorEnv.GRAFT_BPE_MERGES=…`).
  * A SET-but-unreadable or malformed path throws at first use on
  * whichever node hits it — a silent fallback would shift every chunk
  * boundary downstream; an UNSET seam resolves to the regex
  * approximation everywhere.
  */
object Tokenize {
  lazy val default: Tokenizer =
    sys.props.get("graft.bpe.mergesPath")
      .orElse(sys.env.get("GRAFT_BPE_MERGES")) match {
      case Some(path) => new BpeTokenizer(Bpe.loadMerges(path))
      case None => RegexTokenizer
    }
}
