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
      vecCol: String, tau: Double, pruneCells: Int = 64,
      bruteForceMax: Int = 256): DataFrame = {
    val evalVecs: Array[Array[Float]] = evalSet.select(col(vecCol))
      .collect().map(_.getSeq[Float](0).toArray)
    require(evalVecs.nonEmpty, "empty eval set")
    val spark = corpus.sparkSession
    val maxSim: org.apache.spark.sql.expressions.UserDefinedFunction =
      if (evalVecs.length <= bruteForceMax) {
        // benchmark-sized eval set: the flat scan is already cheap
        val bc = spark.sparkContext.broadcast(evalVecs)
        udf((v: Seq[Float]) => {
          val a = v.toArray
          var m = -1.0
          bc.value.foreach { e =>
            val c = Dedup.cosine(a, e)
            if (c > m) m = c
          }
          m
        })
      } else {
        // Large eval set (aggregated benchmark suites reach 10^4-10^5
        // rows): spherical k-means cells over the eval vectors with an
        // EXACT angular pruning bound — for unit vectors the triangle
        // inequality on angles gives cos(a,e) ≤ cos(max(0, θ(a,c) − φ))
        // where φ is the cell's max member-to-centroid angle, so a cell
        // whose bound cannot beat the running max is skipped without
        // touching its members. Unlike an LSH prefilter this loses NO
        // recall: the reported max is bit-identical to the flat scan
        // (the exact member cosines still come from Dedup.cosine on the
        // RAW vectors; spec-pinned equivalence). Driver state stays
        // bounded: the eval matrix (already collected above) plus
        // pruneCells centroids.
        val cells = buildDecontamCells(evalVecs, pruneCells)
        val bc = spark.sparkContext.broadcast((evalVecs, cells))
        udf((v: Seq[Float]) => {
          val (evs, cs) = bc.value
          prunedMaxSim(v.toArray, evs, cs)
        })
      }
    corpus.select(col(idCol), round(maxSim(col(vecCol)), 4).as("max_eval_sim"))
      .withColumn("dropped", col("max_eval_sim") >= tau)
  }

  /** Per cell: unit centroid, max member angle, member indices SORTED by
    * their angle to the centroid (parallel `angles` array) — the sort is
    * what lets [[prunedMaxSim]] binary-search the annulus of members that
    * can still beat the running max. `zeroNorm` holds eval vectors whose
    * cosine is 0.0 by definition (handled as a floor, not a cell).
    */
  private[operators] final case class DecontamCells(
      centroids: Array[Array[Double]], maxAngle: Array[Double],
      members: Array[Array[Int]], angles: Array[Array[Double]],
      zeroNorm: Array[Int], dim: Int)
      extends Serializable

  private[operators] def buildDecontamCells(evalVecs: Array[Array[Float]],
      pruneCells: Int): DecontamCells = {
    require(pruneCells >= 1, "pruneCells must be >= 1")
    val dim = evalVecs.map(_.length).max
    def norm(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      math.sqrt(s)
    }
    val norms = evalVecs.map(norm)
    val nonZero = evalVecs.indices.filter(i => norms(i) > 0.0).toArray
    val zero = evalVecs.indices.filterNot(i => norms(i) > 0.0).toArray
    // unit copies padded to the common dim (a shorter vector behaves as
    // zero-extended in the dot product, matching Dedup.cosine's
    // min-length loop when the OTHER side is full-length)
    val units = nonZero.map { i =>
      val u = new Array[Double](dim)
      var j = 0
      while (j < evalVecs(i).length) { u(j) = evalVecs(i)(j) / norms(i); j += 1 }
      u
    }
    // degenerate eval set (every vector zero-norm): no cells — the scan
    // falls through to the zeroNorm floor in prunedMaxSim
    if (units.isEmpty)
      return DecontamCells(Array.empty, Array.empty, Array.empty,
        Array.empty, zero, dim)
    val k = math.max(1, math.min(pruneCells, units.length))
    def assignTo(cents: Array[Array[Double]], u: Array[Double]): Int = {
      var best = 0; var bestDot = Double.MinValue
      var c = 0
      while (c < cents.length) {
        var d = 0.0; var j = 0
        while (j < dim) { d += u(j) * cents(c)(j); j += 1 }
        if (d > bestDot) { bestDot = d; best = c }
        c += 1
      }
      best
    }
    // Train on a stride subsample (standard IVF practice — centroids
    // stabilize long before the full set is seen) so the driver-side
    // build stays O(iters·sample·k·dim), then assign everything once.
    val sampleN = math.min(units.length, math.max(k * 16, 1024))
    val sample = Array.tabulate(sampleN)(i =>
      units((i.toLong * units.length / sampleN).toInt))
    var cents = Array.tabulate(k)(c => sample((c.toLong * sampleN / k).toInt).clone())
    val sAssign = new Array[Int](sampleN)
    for (_ <- 0 until 4) {
      var i = 0
      while (i < sampleN) { sAssign(i) = assignTo(cents, sample(i)); i += 1 }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      i = 0
      while (i < sampleN) {
        val c = sAssign(i); counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += sample(i)(j); j += 1 }
        i += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else {
          var s = 0.0; var j = 0
          while (j < dim) { s += sums(c)(j) * sums(c)(j); j += 1 }
          val n = math.sqrt(s)
          if (n == 0.0) cents(c) else sums(c).map(_ / n)
        }
      }
    }
    val assign = Array.tabulate(units.length)(i => assignTo(cents, units(i)))
    val pairs = Array.fill(k)(
      scala.collection.mutable.ArrayBuffer.empty[(Double, Int)])
    var i = 0
    while (i < units.length) {
      val c = assign(i)
      var d = 0.0; var j = 0
      while (j < dim) { d += units(i)(j) * cents(c)(j); j += 1 }
      val ang = math.acos(math.max(-1.0, math.min(1.0, d)))
      pairs(c) += ((ang, nonZero(i)))
      i += 1
    }
    val sorted = pairs.map(_.sortBy(_._1).toArray)
    DecontamCells(cents,
      sorted.map(p => if (p.isEmpty) 0.0 else p.last._1),
      sorted.map(_.map(_._2)), sorted.map(_.map(_._1)), zero, dim)
  }

  /** Exact max cosine against the eval set via cell pruning — always the
    * same value as the flat Dedup.cosine scan.
    */
  private[operators] def prunedMaxSim(a: Array[Float],
      evalVecs: Array[Array[Float]], cells: DecontamCells): Double = {
    var m = -1.0
    if (cells.zeroNorm.nonEmpty && m < 0.0) m = 0.0 // zero-norm eval → cos 0.0
    var na = 0.0
    var i = 0
    while (i < a.length) { na += a(i).toDouble * a(i); i += 1 }
    if (na == 0.0) return math.max(m, 0.0) // zero row → every cosine is 0.0
    if (a.length != cells.dim) {
      // mismatched dims void the angular bound (Dedup.cosine truncates to
      // the shorter vector) — fall back to the flat scan for this row
      evalVecs.foreach { e => val c = Dedup.cosine(a, e); if (c > m) m = c }
      return m
    }
    val inv = 1.0 / math.sqrt(na)
    val k = cells.centroids.length
    val bounds = new Array[Double](k)
    val thetas = new Array[Double](k)
    var c = 0
    while (c < k) {
      var d = 0.0; var j = 0
      while (j < cells.dim) { d += a(j) * inv * cells.centroids(c)(j); j += 1 }
      val theta = math.acos(math.max(-1.0, math.min(1.0, d)))
      thetas(c) = theta
      bounds(c) = if (theta <= cells.maxAngle(c)) 1.0
        else math.cos(theta - cells.maxAngle(c))
      c += 1
    }
    val order = (0 until k).sortBy(c => -bounds(c))
    val eps = 1e-9 // absorbs double rounding in the bounds, never the max
    order.foreach { c =>
      if (bounds(c) + eps > m) {
        // annulus refinement: member e can only beat m when
        // |θ(a,c) − θ(c,e)| < acos(m) (angular triangle inequality), and
        // members are sorted by θ(c,e) — binary-search the eligible band
        // instead of dotting the whole cell. Once one tight match raises
        // m, acos(m) collapses and later cells contribute a handful of
        // candidates each.
        val thetaAc = thetas(c)
        val band = math.acos(math.max(-1.0, math.min(1.0, m - eps)))
        val angs = cells.angles(c)
        val lo = lowerBound(angs, thetaAc - band)
        var idx = lo
        while (idx < angs.length && angs(idx) < thetaAc + band) {
          val cos = Dedup.cosine(a, evalVecs(cells.members(c)(idx)))
          if (cos > m) m = cos
          idx += 1
        }
      }
    }
    m
  }

  /** First index in sorted `xs` with xs(i) >= x. */
  private def lowerBound(xs: Array[Double], x: Double): Int = {
    var lo = 0; var hi = xs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
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
