package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unit coverage for the corpus-hygiene operators (Quality) beyond the
  * DuckDB-gated queries: hand-computable fixtures pin the exact semantics
  * (edge rows shorter than k, empty text, tie handling, flag thresholds).
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("repetition metrics: hand-computed counters and flag") {
    val df = Quality.withRepetitionMetrics(docs(
      (1L, "a a a a"),          // 4 words, 1 distinct -> repetitive
      (2L, "a b c d"),          // all distinct
      (3L, "x y x y x y"),      // 6 words 2 distinct; 5 bigrams 2 distinct
      (4L, ""),                 // empty text
      (5L, "solo")              // 1 word, 0 bigrams
    ), "text").select("doc_id", "n_words", "n_distinct_words",
      "n_bigrams", "n_distinct_bigrams", "is_repetitive")
    val m = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L) == Row(1L, 4L, 1L, 3L, 1L, true))
    assert(m(2L) == Row(2L, 4L, 4L, 3L, 3L, false))
    assert(m(3L) == Row(3L, 6L, 2L, 5L, 2L, true))
    assert(m(4L) == Row(4L, 0L, 0L, 0L, 0L, false))
    assert(m(5L) == Row(5L, 1L, 1L, 0L, 0L, false))
  }

  test("top word counts: mode per doc, docs without words absent") {
    val out = Quality.topWordCounts(docs(
      (1L, "a b a c a"), (2L, "x y"), (3L, "")), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("pii redaction: counts on original text, masks all three families") {
    val out = Quality.withPiiRedaction(docs(
      (1L, "mail a.b@x.io and c@d.org call +1-555-0100 from 10.0.0.1 end"),
      (2L, "clean text")), "text")
      .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2 && out(1L).getLong(2) == 1 && out(1L).getLong(3) == 1)
    val red = out(1L).getString(4)
    assert(red == "mail <EMAIL> and <EMAIL> call <PHONE> from <IP> end")
    assert(out(2L).getString(4) == "clean text")
  }

  test("shingles: non-overlapping, k-word, short rows yield none") {
    val out = Quality.shingles(docs(
      (1L, "a b c d e f g"),   // k=3 -> 2 shingles, trailing g dropped
      (2L, "p q")), "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(out == Set((1L, 0, "a b c"), (1L, 1, "d e f")))
  }

  test("dup span counts: owner is min doc_id, self-spans not counted") {
    val out = Quality.dupSpanCounts(docs(
      (1L, "a b c d e f"),      // owns both shingles (k=3)
      (2L, "a b c x y z"),      // first shingle owned by doc 1
      (3L, "a b c d e f")),     // both shingles owned by doc 1
      "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> (2L, 0L), 2L -> (2L, 1L), 3L -> (2L, 2L)))
  }

  test("contamination counts: overlapping grams, zero-hit docs surface") {
    val bench = docs((100L, "q w e r t y u i"))           // one 8-gram
    val corpus = docs(
      (1L, "pad q w e r t y u i tail"),                   // contains it
      (2L, "a b c d e f g h i"),                          // no overlap
      (3L, "tiny"))                                       // < k words
    val out = Quality.contaminationCounts(corpus, bench, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(1L -> (1L, true), 2L -> (0L, false), 3L -> (0L, false)))
  }

  test("ngrams: stride-1 overlap and count n-k+1") {
    val out = Quality.ngrams(docs((1L, "a b c d")), "doc_id", "text", 2)
      .select("gram").as[String].collect().toSeq
    assert(out == Seq("a b", "b c", "c d"))
  }

  test("filter config: per-rule flags, overlap accounting, null-safe") {
    val d = Seq((1L, "ok ok ok", 10L), (2L, "x", 2L),
      (3L, null.asInstanceOf[String], 0L), (4L, "fine text here", 20L))
      .toDF("doc_id", "text", "n_chars")
    val rules = Seq(
      Quality.FilterRule("chars", col("n_chars") >= 5),
      Quality.FilterRule("nonnull", length(col("text")) > 1))
    val rpt = Quality.filterReport(d, rules)
      .select("doc_id", "pass_chars", "pass_nonnull", "keep_doc")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    // doc 2 fails chars only; doc 3 fails BOTH (null text coalesces to
    // fail, not null) — overlapping failures stay per-rule
    assert(rpt == Map(
      1L -> (true, true, true), 2L -> (false, false, false),
      3L -> (false, false, false), 4L -> (true, true, true)))
    val sums = Quality.filterSummary(Quality.filterReport(d, rules), rules).first()
    assert(sums.getLong(0) == 2 && sums.getLong(1) == 2) // fail_chars, fail_nonnull
    assert(sums.getLong(2) == 4 && sums.getLong(3) == 2) // n_docs, n_kept
    assert(Quality.applyFilterConfig(d, rules).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 4L))
  }

  test("semantic decontam: planted near-eval rows drop; plan is map-only") {
    def axis(dim: Int, a: Int, eps: Float): Array[Float] = {
      val v = new Array[Float](dim); v(a) = 1f; v((a + 8) % dim) = eps; v
    }
    val evalSet = Seq((100L, axis(16, 0, 0f)), (101L, axis(16, 1, 0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, axis(16, 0, 0.1f)),  // near eval 100 → dropped
      (2L, axis(16, 5, 0.1f)),  // orthogonal to both → kept
      (3L, axis(16, 1, 0.05f))) // near eval 101 → dropped
      .toDF("vec_id", "embedding")
    val out = Quality.semanticDecontam(corpus, evalSet, "vec_id", "embedding",
      tau = 0.9)
    val flags = out.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(flags == Map(1L -> true, 2L -> false, 3L -> true))
    // broadcast eval, map-only corpus side: no shuffle exchange anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decontam scan must not shuffle:\n$plan")
  }

  test("semantic decontam: cell-pruned path is bit-identical to the flat scan") {
    val rnd = new scala.util.Random(42)
    def vec(dim: Int): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val dim = 24
    // eval set large enough for several cells, plus adversarial members:
    // a zero vector, a short vector, and near-duplicates of corpus rows
    val evalRows = (0 until 400).map(i => (1000L + i, vec(dim))) ++
      Seq((2000L, new Array[Float](dim)), (2001L, vec(7)))
    val evalSet = evalRows.toDF("vec_id", "embedding")
    val corpusRows = (0 until 150).map(i => (i.toLong, vec(dim))) ++
      Seq((900L, evalRows(3)._2.map(x => x * 2f)),   // exact direction match
        (901L, new Array[Float](dim)),               // zero corpus row
        (902L, vec(30)))                             // longer than eval dim
    val corpus = corpusRows.toDF("vec_id", "embedding")
    def run(bruteMax: Int) =
      Quality.semanticDecontam(corpus, evalSet, "vec_id", "embedding",
        tau = 0.5, pruneCells = 16, bruteForceMax = bruteMax)
        .orderBy($"vec_id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val brute = run(Int.MaxValue)
    val pruned = run(0)
    assert(pruned.sameElements(brute),
      "cell-pruned max_eval_sim must be bit-identical to the flat scan")
    // sanity: the planted direction-match is flagged at full similarity
    val m = brute.map { case (id, s, dr) => id -> ((s, dr)) }.toMap
    assert(m(900L)._1 == 1.0 && m(900L)._2)
    // degenerate pruned path: an eval set of only zero vectors still
    // reports the 0.0 floor instead of crashing the cell build
    val zeros = (0 until 300).map(i => (5000L + i, new Array[Float](8)))
      .toDF("vec_id", "embedding")
    val tiny = Seq((1L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val zOut = Quality.semanticDecontam(tiny, zeros, "vec_id", "embedding",
      tau = 0.5, bruteForceMax = 0).collect()
    assert(zOut.length == 1 && zOut.head.getDouble(1) == 0.0 && !zOut.head.getBoolean(2))
  }

  test("filter config pushes simple rules into the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-filtercfg").toString + "/t"
    docs((1L, "a"), (2L, "bb")).withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(dir)
    val survivors = Quality.applyFilterConfig(spark.read.parquet(dir),
      Seq(Quality.FilterRule("chars", col("n_chars") >= 2)))
    val scan = survivors.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual(n_chars,2)"),
      s"rule did not reach the scan:\n$scan")
    assert(survivors.count() == 1)
  }
}
