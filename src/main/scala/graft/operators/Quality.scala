package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-quality operators for large-scale training-data pipelines:
  * repetition metrics, PII redaction, corpus-level shingle dedup, and
  * benchmark decontamination. These extend the reference's per-document
  * filter surface (/root/reference/chunking/chunkers — which gates on
  * length/format only) with the published pretraining-corpus hygiene
  * passes (Gopher-style repetition rules, C4-style scrubbing, Lee et al.
  * exact-substring dedup, n-gram benchmark decontamination).
  *
  * Scale posture: per-document metrics are pure array expressions (no
  * shuffle, whole-stage codegen); corpus-level passes shuffle once on the
  * shingle key with map-side partial aggregation; decontamination
  * broadcasts the (small) benchmark n-gram set so the 100 TB side never
  * shuffles.
  */
object Quality {

  private def words(textCol: Column): Column =
    filter(split(trim(textCol), " +"), w => length(w) > 0)

  /** Adjacent-pair n-grams (n=2) of a string array without a shuffle:
    * zip the array against itself shifted by one.
    */
  private def bigrams(ws: Column): Column =
    zip_with(
      slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))

  /** Gopher-style repetition counters per row, all integer-exact so the
    * oracle comparison never hinges on float rounding:
    * `n_words`, `n_distinct_words`, `n_bigrams`, `n_distinct_bigrams`,
    * plus boolean repetition flags from integer arithmetic.
    * A document where >50% of words are repeats of earlier words, or
    * >60% of bigrams are repeated, is flagged `is_repetitive`.
    */
  def withRepetitionMetrics(df: DataFrame, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val bg = bigrams(ws)
    df.withColumn("n_words", size(ws).cast("long"))
      .withColumn("n_distinct_words", size(array_distinct(ws)).cast("long"))
      .withColumn("n_bigrams", size(bg).cast("long"))
      .withColumn("n_distinct_bigrams", size(array_distinct(bg)).cast("long"))
      .withColumn("is_repetitive",
        col("n_distinct_words") * 2 < col("n_words") ||
          col("n_distinct_bigrams") * 5 < col("n_bigrams") * 2)
  }

  /** The most frequent word's count per row. This one genuinely needs a
    * per-(row, word) aggregation; it shuffles on (id, word) with map-side
    * combine — the scale-correct shape for a mode computation.
    * Returns (idCol, top_word_count) — one row per input row with >=1 word.
    */
  def topWordCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(words(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("top_word_count"))

  // C4-style scrub patterns — deliberately simple, identical semantics in
  // Java regex (Spark) and DuckDB's RE2: no backrefs, no lookaround.
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+1-[0-9]{3}-[0-9]{4}"
  val ipPattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Count and mask PII-shaped spans (emails, NANP-style phone numbers,
    * IPv4 addresses). Counting uses `regexp_count` and masking chained
    * global `regexp_replace` — both codegen'd builtins. IPs are masked
    * before emails so a host part can't be half-rewritten, and the counts
    * are taken on the ORIGINAL text so they are order-independent.
    */
  def withPiiRedaction(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val masked =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, ipPattern, "<IP>"),
          emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>")
    df.withColumn("n_emails", regexp_count(t, lit(emailPattern)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(phonePattern)).cast("long"))
      .withColumn("n_ips", regexp_count(t, lit(ipPattern)).cast("long"))
      .withColumn("redacted", masked)
  }

  /** Non-overlapping k-word shingles per row: (id, shingle_idx, shingle).
    * The building block for corpus-level exact-span dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"):
    * non-overlapping shingles bound the exploded row count at
    * n_words/k per document.
    */
  /** One named, declarative filter rule: `keep` is the predicate a
    * SURVIVING document satisfies. Rules are plain Column expressions so
    * the whole config stays inside Catalyst (codegen'd, pushdown-able) —
    * the Spark form of a Dolma/RedPajama filter-config block.
    */
  final case class FilterRule(name: String, keep: Column)

  /** Apply a filter config WITHOUT dropping rows: appends one boolean
    * per rule (`pass_<name>`, null text treated as fail) and `keep_doc`
    * (conjunction). The audit form every curation run wants first — "what
    * would this config do" — and the input to [[filterSummary]] /
    * [[applyFilterConfig]]; one scan, no shuffle, plan stays codegen'd.
    */
  def filterReport(df: DataFrame, rules: Seq[FilterRule]): DataFrame = {
    require(rules.nonEmpty, "empty filter config")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val flagged = rules.foldLeft(df) { (d, r) =>
      d.withColumn(s"pass_${r.name}", coalesce(r.keep, lit(false)))
    }
    flagged.withColumn("keep_doc",
      rules.map(r => col(s"pass_${r.name}")).reduce(_ && _))
  }

  /** Per-rule accounting over a [[filterReport]]: docs failing each rule
    * (rules overlap — failures need not sum to drops), total docs, kept
    * docs. One aggregation over the one-scan report.
    */
  def filterSummary(report: DataFrame, rules: Seq[FilterRule]): DataFrame = {
    val aggs = rules.map(r =>
      sum(when(!col(s"pass_${r.name}"), 1L).otherwise(0L)).as(s"fail_${r.name}")) ++
      Seq(count(lit(1)).as("n_docs"),
        sum(when(col("keep_doc"), 1L).otherwise(0L)).as("n_kept"))
    report.agg(aggs.head, aggs.tail: _*)
  }

  /** The survivor corpus under a config. The raw conjunction (no
    * null-coalescing) keeps the predicates translatable to data-source
    * filters — a `coalesce(p, false)` wrapper would block pushdown, and
    * WHERE semantics already drop null-evaluating rows, so the survivor
    * set is identical to [[filterReport]]'s `keep_doc`.
    */
  def applyFilterConfig(df: DataFrame, rules: Seq[FilterRule]): DataFrame =
    df.filter(rules.map(_.keep).reduce(_ && _))

  /** SEMANTIC decontamination — the embedding-space member of the family
    * (dc1/dc2 catch verbatim n-gram leaks; paraphrased benchmark items
    * share no 8-gram but sit next to the eval item in embedding space):
    * a training row is flagged when its embedding is within cosine `tau`
    * of ANY eval-set embedding. Eval sets are benchmark-sized by
    * definition, so the eval matrix is bounded driver state broadcast to
    * a MAP-ONLY scan — the corpus never shuffles, exactly like dc1's
    * broadcast gram set. Emits (id, max_eval_sim@4dp, dropped), the
    * audit-first shape of [[filterReport]].
    */
  def semanticDecontam(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      vecCol: String, tau: Double): DataFrame = {
    val evalVecs: Array[Array[Float]] = evalSet.select(col(vecCol))
      .collect().map(_.getSeq[Float](0).toArray)
    require(evalVecs.nonEmpty, "empty eval set")
    val bc = corpus.sparkSession.sparkContext.broadcast(evalVecs)
    val maxSim = udf((v: Seq[Float]) => {
      val a = v.toArray
      var m = -1.0
      bc.value.foreach { e =>
        val c = Dedup.cosine(a, e)
        if (c > m) m = c
      }
      m
    })
    corpus.select(col(idCol), round(maxSim(col(vecCol)), 4).as("max_eval_sim"))
      .withColumn("dropped", col("max_eval_sim") >= tau)
  }

  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val ws = words(col(textCol))
    // sequence(0, n) flips to a DESCENDING sequence when n < 0, so short
    // rows must short-circuit to an empty index array, not sequence(0,-1)
    val nShingles = (size(col("ws")) / k).cast("int")
    val idxs = when(nShingles > 0, sequence(lit(0), nShingles - 1))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), ws.as("ws"))
      .select(col(idCol),
        explode(transform(idxs,
          i => struct(i.as("shingle_idx"),
            concat_ws(" ", slice(col("ws"), i * k + 1, lit(k))).as("shingle")))).as("s"))
      .select(col(idCol), col("s.shingle_idx"), col("s.shingle"))
  }

  /** Corpus-level duplicated-span counters: for every document, how many of
    * its k-word shingles are owned by an EARLIER document (owner = min id
    * over the corpus). One shuffle on the shingle with map-side combine,
    * one join back — no all-pairs surface anywhere.
    * Returns (id, n_shingles, n_dup_shingles); rows with zero shingles
    * (shorter than k words) are absent.
    */
  def dupSpanCounts(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val sh = shingles(df, idCol, textCol, k)
    val owners = sh.groupBy(col("shingle")).agg(min(col(idCol)).as("owner"))
    sh.join(owners, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("owner") < col(idCol), 1)).as("n_dup_shingles"))
  }

  /** Overlapping k-word n-grams per row (stride 1) — the decontamination
    * probe surface. Row count is ~n_words per document; keep k large
    * enough (>=8) that matches mean real leakage.
    */
  def ngrams(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val ws = words(col(textCol))
    // same descending-sequence guard as `shingles` for rows with < k words
    val idxs = when(size(col("ws")) >= k, sequence(lit(0), size(col("ws")) - k))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), ws.as("ws"))
      .select(col(idCol),
        explode(transform(idxs,
          i => concat_ws(" ", slice(col("ws"), i + 1, lit(k))))).as("gram"))
  }

  /** Benchmark decontamination: per corpus document, the number of its
    * overlapping k-grams that appear anywhere in `benchmark`. The benchmark
    * gram set is distinct-ed and BROADCAST (benchmarks are tiny relative to
    * a pretraining corpus), so the corpus side stays shuffle-free — the
    * scale-correct shape for a 100 TB sweep. Documents shorter than k words
    * surface with zero counts via the left join back to `corpus`.
    */
  def contaminationCounts(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    val benchGrams = ngrams(benchmark, idCol, textCol, k)
      .select(col("gram")).distinct()
    val hits = ngrams(corpus, idCol, textCol, k)
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("is_contaminated", col("n_contaminated") > 0)
  }

  /** Benchmark decontamination as a corpus TRANSFORM — the removal
    * counterpart to [[contaminationCounts]]'s per-doc counters, the way the
    * reference pipelines (and Llama/Dolma-style pretraining preps) actually
    * consume it: every corpus token covered by a k-gram that appears in the
    * benchmark is CUT, with overlapping matched windows first merged into
    * maximal spans so a leaked passage disappears as one contiguous hole.
    *
    * Scale shape: the benchmark k-gram fingerprint table is distinct-ed and
    * BROADCAST (benchmarks are tiny next to a pretraining corpus), so the
    * corpus window scan is map-only — a left-semi broadcast-hash probe with
    * no corpus-sized shuffle anywhere. Only MATCHED windows (contamination-
    * sized, near-zero on a clean corpus) reach the per-doc island merge,
    * which reuses the exact machinery of [[Dedup.removeDuplicateSpans]].
    *
    * Returns one row per corpus document: (id, n_spans, toks_removed,
    * text_clean); clean documents keep their full (whitespace-normalized)
    * token stream.
    */
  def removeContaminatedSpans(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int, sep: String = " "): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val base = Dedup.tokenBase(corpus, idCol, textCol)
    val benchFps = Dedup.strideWindows(
        Dedup.tokenBase(benchmark, idCol, textCol), k)
      .select(col("_fp")).distinct()
    val covered = Dedup.strideWindows(base, k)
      .join(broadcast(benchFps), Seq("_fp"), "left_semi")
      .select(col("id"), col("p").as("s"), (col("p") + (k - 1)).as("e"))
    Dedup.cutCoveredSpans(base, covered, sep)
  }
}
