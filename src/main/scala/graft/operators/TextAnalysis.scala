package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language id, fingerprinting. All column-expression-based
  * (codegen'd builtins) except langid/bpe-count which are pure-Scala UDFs.
  */
object TextAnalysis {

  /** BPE-ish token pattern shared with the DuckDB oracle (ASCII-safe subset:
    * letter runs | digit runs | single non-space-alnum marks).
    */
  val tokenPattern = "[A-Za-z]+|[0-9]+|[^ A-Za-z0-9]"

  /** Whitespace + regex token counts per row (X5 surface). */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_ws_tokens", size(split(trim(col(textCol)), "\\s+")).cast("long"))
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(col(textCol), lit(tokenPattern), lit(0))).cast("long"))

  val defaultStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")

  /** Quality heuristics: punctuation ratio, stopword ratio, mean word length.
    * Composite score in [0,1]: rewards stopword presence (naturalness) and
    * penalizes punctuation soup / extreme word lengths.
    */
  def withQualityScore(df: DataFrame, textCol: String,
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val nTok = greatest(size(toks), lit(1))
    val swArray = array(stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(swArray, t)))
    val nPunct = size(regexp_extract_all(col(textCol), lit("[.,;:!?]"), lit(0)))
    val meanWordLen = (length(trim(col(textCol))) - (size(toks) - 1)).cast("double") / nTok
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("punct_ratio", round(nPunct.cast("double") / nTok, 4))
      .withColumn("stopword_ratio", round(nStop.cast("double") / nTok, 4))
      .withColumn("mean_word_len", round(meanWordLen, 4))
  }

  /** Heuristic language id + agreement with a labeled column when present. */
  def withLangId(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", GraftFunctions.langid(col(textCol)))

  /** Deterministic document fingerprints: rolling 64-bit + md5 of the
    * normalized text (the md5 variant is SQL-oracle-matched).
    */
  def withFingerprints(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp_rolling", GraftFunctions.fingerprint(col(textCol)))
      .withColumn("fp_md5", md5(
        trim(regexp_replace(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), " +", " "))))

  /** HTML boilerplate strip for web-scrape corpora: drop script/style
    * blocks with their content, drop every remaining tag, decode the five
    * XML entities plus nbsp, collapse whitespace. Pure chained
    * regexp_replace/replace — codegen'd, shuffle-free, and expressible
    * identically in RE2 engines (the character classes avoid Java-only
    * escapes like \s, whose definition differs between regex dialects).
    */
  def stripHtml(df: DataFrame, htmlCol: String, outCol: String = "plain"): DataFrame = {
    val noBlocks = regexp_replace(col(htmlCol),
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    df.withColumn(outCol, trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " ")))
  }
}
