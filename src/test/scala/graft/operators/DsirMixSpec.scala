package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** DSIR importance weights and domain-mixture sampling. */
class DsirMixSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("dsir separates target-like from off-target documents") {
    // target docs share a vocabulary; off-target docs use a disjoint one.
    // A fresh doc written in the target vocabulary must outscore one
    // written off-target.
    val docs = Seq(
      (0L, true, "alpha beta gamma alpha beta"),
      (1L, true, "beta gamma alpha gamma"),
      (2L, false, "zulu yankee xray zulu"),
      (3L, false, "xray zulu yankee"),
      (4L, false, "alpha beta gamma beta"), // target-voc doc outside the slice
      (5L, false, "zulu xray yankee zulu")
    ).toDF("id", "is_t", "text")
    val w = TextAnalysis.dsirLogWeights(docs, "id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the score is a RATIO vs the raw corpus: with target ⊆ raw and add-1
    // smoothing the absolute sign floats, but ordering must hold — every
    // target-vocabulary doc above every off-target doc
    val targetVoc = Seq(0L, 1L, 4L).map(w)
    val offVoc = Seq(2L, 3L, 5L).map(w)
    assert(targetVoc.min > offVoc.max,
      s"target-voc docs $targetVoc must all outscore off-target docs $offVoc")
  }

  test("in-row histogram path equals the per-token explode path exactly") {
    // the fast path collapses tokenize+bucket inside the row; forcing a
    // column bucket fn takes the legacy explode + groupBy path. Same
    // inputs — including Spark-trim edge cases (tabs/newlines are NOT
    // trimmed, multi-spaces make empty tokens, unicode codepoints count
    // once) — must produce identical weights.
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
      .limit(50)
      .union(Seq(
        (9001L, "\thello  world \n", "en", "srcx", 15L),
        (9002L, "  café ☕ naïve-test 42!x  ", "fr", "srcx", 26L),
        (9003L, "", "en", "srcx", 0L),
        (9004L, "    ", "en", "srcx", 4L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val fast = TextAnalysis.dsirLogWeights(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val slow = TextAnalysis.dsirLogWeights(docs, "doc_id", "text", col("lang") === "en",
        bucketOf = c => TextAnalysis.portableTokenBucket(c, 256))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast == slow)
    val fastNll = TextAnalysis.unigramPerplexity(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val slowNll = TextAnalysis.unigramPerplexity(docs, "doc_id", "text", col("lang") === "en",
        bucketOf = c => TextAnalysis.portableTokenBucket(c, 256))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fastNll == slowNll)
  }

  test("dsir weights are deterministic and cover every doc") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
    val a = TextAnalysis.dsirLogWeights(docs, "doc_id", "text", col("lang") === "en")
    val rows = a.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(rows.size == docs.count())
    val b = TextAnalysis.dsirLogWeights(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(rows == b)
  }

  test("dsir en-slice scores en docs higher than others on the real corpus") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
    val scored = TextAnalysis.dsirLogWeights(docs, "doc_id", "text", col("lang") === "en")
      .withColumnRenamed("id", "doc_id")
      .join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
    val Array(enAvg, otherAvg) = scored
      .groupBy(($"lang" === "en").as("is_en")).agg(avg($"log_w").as("m"))
      .orderBy($"is_en".desc).collect().map(_.getDouble(1))
    assert(enAvg > otherAvg, s"en avg $enAvg must exceed non-en avg $otherAvg")
  }

  test("unigram perplexity ranks reference-like docs below off-reference docs") {
    val docs = Seq(
      (0L, true, "alpha beta gamma alpha beta gamma alpha beta"),
      (1L, true, "beta gamma alpha gamma alpha beta"),
      (2L, false, "alpha beta gamma alpha"),  // written in reference vocab
      (3L, false, "zulu yankee xray zulu yankee xray")
    ).toDF("id", "is_r", "text")
    val nll = TextAnalysis.unigramPerplexity(docs, "id", "text", col("is_r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(2) < nll(3), "reference-vocab doc must have lower NLL")
    assert(nll(0) < nll(3) && nll(1) < nll(3))
  }

  test("domain mix keeps everything in a domain scarcer than its target share") {
    val df = ((1L to 500L).map(i => (i, "big", 10L)) ++
      (1000L to 1004L).map(i => (i, "rare", 10L))).toDF("id", "dom", "units")
    val kept = Sampling.domainMixSample(df, "dom", "id", "units",
      Map("big" -> 1, "rare" -> 1), budgetNum = 1, budgetDen = 2)
    val byDom = kept.groupBy($"dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rare's budget (25% of units) far exceeds its 5 rows -> rate caps at 1
    assert(byDom("rare") == 5L)
    // big is downsampled towards its 25% budget (hash scatter, not exact)
    assert(byDom("big") < 300L && byDom("big") > 100L)
  }

  test("domain mix keep set matches a driver-side recompute of the threshold rule") {
    val df = (1L to 400L).map(i => (i, if (i % 4 == 0) "a" else "b", 5L))
      .toDF("id", "dom", "units")
    val kept = Sampling.domainMixSample(df, "dom", "id", "units",
      Map("a" -> 3, "b" -> 1), budgetNum = 1, budgetDen = 2)
      .select($"id").collect().map(_.getLong(0)).toSet
    val rows = (1L to 400L).map(i => (i, if (i % 4 == 0) "a" else "b", 5L))
    val units = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = units.values.sum
    def thr(dom: String): Long = {
      val share = if (dom == "a") 3L else 1L
      val budget = total * (1.0 / 2) * share / 4
      math.min(1000000L, math.floor(1000000L * budget / math.max(units(dom), 1L)).toLong)
    }
    val want = rows.filter { case (id, dom, _) =>
      (id * 2654435761L) % 4294967296L % 1000000L < thr(dom)
    }.map(_._1).toSet
    assert(kept == want)
  }

  test("unlisted domains get share 0 and are dropped entirely") {
    val df = Seq((1L, "a", 10L), (2L, "junk", 10L), (3L, "a", 10L))
      .toDF("id", "dom", "units")
    val kept = Sampling.domainMixSample(df, "dom", "id", "units",
      Map("a" -> 1), budgetNum = 1, budgetDen = 1)
    assert(kept.filter($"dom" === "junk").count() == 0L)
  }
}
