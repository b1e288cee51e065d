package graft.core

import java.nio.charset.StandardCharsets.ISO_8859_1
import org.apache.spark.sql.{DataFrame, functions => F}

/** Byte-level BPE tokenization (SURVEY §2.8 X5, §7.4 fidelity item).
  *
  * The reference counts real BPE tokens (tiktoken,
  * /root/reference/tools/aoai.py:266-276). The tiktoken merges TABLE is an
  * external artifact, but the MECHANISM is public (Sennrich et al. 2016;
  * byte-level per GPT-2): pre-tokenize with a cl100k-style regex, explode
  * each pre-token into UTF-8 bytes, then greedily apply ranked pair merges.
  * This module implements that mechanism end-to-end — a trainer that learns
  * a merges table from a corpus and an encoder that applies it — so token
  * counts follow real BPE dynamics (frequent words collapse to one token,
  * rare words decompose into subwords, any byte sequence round-trips).
  *
  * Training is the scale-correct two-phase shape: ONE distributed scan
  * aggregates pre-token frequencies (vocabulary-sized result), and merge
  * learning runs over that small frequency table — the same structure
  * public tokenizer trainers use. Symbols are ISO-8859-1 strings, one char
  * per byte, so merge keys stay cheap and encoding is lossless.
  */
object Bpe {

  /** cl100k-style pre-tokenization: contractions, letter runs with an
    * optional leading non-letter (captures " word"), 1-3 digit runs,
    * punctuation runs, newline runs, trailing/other whitespace.
    * (Pattern structure is public via the tiktoken source.)
    */
  private val preTokenPattern = java.util.regex.Pattern.compile(
    """'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+""")

  def preTokens(s: String): Seq[String] = {
    if (s == null || s.isEmpty) return Seq.empty
    val m = preTokenPattern.matcher(s)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** UTF-8 bytes of a pre-token as 1-char-per-byte symbols. */
  private def byteSymbols(pre: String): Array[String] = {
    val b = pre.getBytes("UTF-8")
    Array.tabulate(b.length)(i => new String(b, i, 1, ISO_8859_1))
  }

  /** Learn `numMerges` merges from a pre-token frequency table (Sennrich
    * alg.): repeatedly merge the most frequent adjacent symbol pair.
    * Deterministic: ties break on the lexicographically smallest pair.
    */
  def train(wordCounts: Iterable[(String, Long)], numMerges: Int): IndexedSeq[(String, String)] = {
    var vocab: Array[(Array[String], Long)] =
      wordCounts.iterator.map { case (w, c) => (byteSymbols(w), c) }.toArray
    val merges = IndexedSeq.newBuilder[(String, String)]
    var done = 0
    while (done < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = numMerges
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        vocab = vocab.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        done += 1
      }
    }
    merges.result()
  }

  /** ONE distributed pass: pre-token frequencies over a text column (the
    * only corpus-sized work in training). The collect is bounded twice
    * over: `minCount` drops the long tail and `maxVocab` caps the result
    * at the most frequent entries (TakeOrderedAndProject — no global
    * sort), so driver memory stays fixed no matter the corpus size.
    * Deterministic: ties break on the token itself.
    */
  def wordCounts(df: DataFrame, textCol: String, minCount: Long = 2L,
      maxVocab: Int = 100000): Seq[(String, Long)] = {
    val pre = F.udf((s: String) => preTokens(s))
    df.select(F.explode(pre(F.col(textCol))).as("pre"))
      .groupBy(F.col("pre")).agg(F.count(F.lit(1)).as("n"))
      .filter(F.col("n") >= minCount)
      .orderBy(F.col("n").desc, F.col("pre"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Train a tokenizer from a corpus DataFrame in one scan + driver merge
    * learning over the (small) frequency table.
    */
  def trainOnCorpus(df: DataFrame, textCol: String, numMerges: Int): BpeTokenizer =
    new BpeTokenizer(train(wordCounts(df, textCol).sortBy(p => (p._1)), numMerges))

  // ---- deployment seam: load a merges table from a file ----------------
  //
  // The tiktoken cl100k merges artifact is MIT-licensed but not present in
  // this sandbox (COVERAGE.md §2.8); the seam below lets a deployment drop
  // the file next to the jar and get exact cl100k token counts with ZERO
  // code change (set -Dgraft.bpe.mergesPath=... or GRAFT_BPE_MERGES=...;
  // see Tokenize.default).

  /** One greedy merge pass over `syms` under `rank` — the same
    * lowest-rank-first order as [[BpeTokenizer.encodePreToken]].
    */
  private def applyMerges(syms: scala.collection.mutable.ArrayBuffer[String],
      rank: scala.collection.Map[(String, String), Int]): Unit = {
    var improved = true
    while (improved && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) improved = false
      else {
        syms(bestAt) = syms(bestAt) + syms(bestAt + 1)
        syms.remove(bestAt + 1)
      }
    }
  }

  /** Reconstruct pair merges from a tiktoken-style rank table
    * ("&lt;base64-token&gt; &lt;rank&gt;" per line). BPE invariant: every
    * multi-byte token was created by merging two tokens of lower rank, so
    * walking tokens in rank order and greedy-encoding each one's bytes
    * with the merges recovered so far leaves exactly its two parents —
    * that pair IS the merge. Tokens that don't reduce to two symbols
    * (special tokens outside the merge lattice) are skipped.
    */
  def ranksToMerges(lines: Iterator[String]): IndexedSeq[(String, String)] = {
    val dec = java.util.Base64.getDecoder
    val toks = lines.map(_.trim).filter(_.nonEmpty).map { ln =>
      val sp = ln.split(" ")
      require(sp.length == 2, s"bad rank line: '$ln'")
      (new String(dec.decode(sp(0)), ISO_8859_1), sp(1).toInt)
    }.toIndexedSeq.sortBy(_._2)
    val rank = scala.collection.mutable.HashMap.empty[(String, String), Int]
    val merges = IndexedSeq.newBuilder[(String, String)]
    toks.foreach { case (tok, _) =>
      if (tok.length > 1) {
        val syms = scala.collection.mutable.ArrayBuffer.tabulate(tok.length)(
          i => tok.substring(i, i + 1))
        applyMerges(syms, rank)
        if (syms.length == 2) {
          val pair = (syms(0), syms(1))
          rank(pair) = rank.size
          merges += pair
        }
      }
    }
    merges.result()
  }

  /** Serialize a merges table as a tiktoken-style rank file: the 256
    * single-byte tokens, then each merge's joined token, in rank order.
    * [[ranksToMerges]] inverts this exactly (spec-pinned).
    */
  def mergesToRankLines(merges: IndexedSeq[(String, String)]): Seq[String] = {
    val enc = java.util.Base64.getEncoder
    val singles = (0 until 256).map(b => new String(Array(b.toByte), ISO_8859_1))
    (singles ++ merges.map { case (a, b) => a + b }).zipWithIndex.map {
      case (tok, r) => enc.encodeToString(tok.getBytes(ISO_8859_1)) + " " + r
    }
  }

  /** Load a merges table from a tiktoken-style rank file
    * ("&lt;base64-token&gt; &lt;rank&gt;" per line, `#`-comment lines
    * skipped) — the format of the public cl100k artifact. A plain "A B"
    * pair format is deliberately NOT supported: the byte symbols here can
    * contain literal spaces, which that format cannot carry, and GPT-2
    * merges.txt files assume a byte-to-unicode remap this encoder doesn't
    * use. Malformed content THROWS — a deployment silently falling back
    * to a different tokenizer would shift every chunk boundary
    * downstream.
    */
  def loadMerges(path: String): IndexedSeq[(String, String)] = {
    val all = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path), ISO_8859_1)
    val data = scala.jdk.CollectionConverters.ListHasAsScala(all).asScala
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toIndexedSeq
    require(data.nonEmpty, s"empty merges file: $path")
    val merges = ranksToMerges(data.iterator)
    require(merges.nonEmpty, s"no reconstructible merges in: $path")
    merges
  }
}

/** Greedy byte-level BPE encoder over a ranked merges table. */
final class BpeTokenizer(val merges: IndexedSeq[(String, String)]) extends Tokenizer {
  private val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap

  /** Apply merges to one pre-token: always the LOWEST-rank applicable pair
    * first (the canonical BPE encode order, matching how the table was
    * learned).
    */
  def encodePreToken(pre: String): Seq[String] = {
    val b = pre.getBytes("UTF-8")
    var syms = scala.collection.mutable.ArrayBuffer.tabulate(b.length)(i =>
      new String(b, i, 1, ISO_8859_1))
    var improved = true
    while (improved && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) improved = false
      else {
        syms(bestAt) = syms(bestAt) + syms(bestAt + 1)
        syms.remove(bestAt + 1)
      }
    }
    syms.toSeq
  }

  override def tokens(s: String): Array[String] =
    Bpe.preTokens(s).iterator.flatMap(encodePreToken).toArray

  override def count(s: String): Int =
    if (s == null || s.isEmpty) 0
    else Bpe.preTokens(s).iterator.map(encodePreToken(_).length).sum
}
