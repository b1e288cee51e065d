package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Corpus-overlap MinHash sketches and token-budget-capped selection. */
class OverlapBudgetSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("overlap estimate lands within sketch tolerance of the exact Jaccard") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
    val r = Dedup.corpusMinhashOverlap(docs, "doc_id", "text",
      col("doc_id") % 2 === 0).head()
    val exact = r.getLong(2).toDouble / r.getLong(3)
    val est = r.getDouble(5)
    // k=64 → stderr ≈ sqrt(J(1-J)/64) ≤ 0.0625; allow 3 sigma
    assert(math.abs(est - exact) <= 0.2, s"est $est vs exact $exact")
  }

  test("identical corpora estimate Jaccard 1; disjoint corpora estimate 0") {
    val twin = ((1L to 40L).map(i => (i, s"alpha beta gamma delta epsilon zeta token$i end")) ++
      (101L to 140L).map(i => (i, s"alpha beta gamma delta epsilon zeta token${i - 100} end")))
      .toDF("doc_id", "text")
    val same = Dedup.corpusMinhashOverlap(twin, "doc_id", "text",
      col("doc_id") <= 40L).head()
    assert(same.getDouble(5) == 1.0, "identical halves must match on every row")
    assert(same.getLong(2) == same.getLong(3), "exact intersection == union")

    val disjoint = ((1L to 40L).map(i => (i, s"aa$i bb$i cc$i dd$i ee$i")) ++
      (101L to 140L).map(i => (i, s"xx$i yy$i zz$i ww$i vv$i")))
      .toDF("doc_id", "text")
    val far = Dedup.corpusMinhashOverlap(disjoint, "doc_id", "text",
      col("doc_id") <= 40L).head()
    assert(far.getLong(2) == 0L, "no shared shingles")
    assert(far.getDouble(5) <= 0.1, s"disjoint est should be ~0, got ${far.getDouble(5)}")
  }

  test("token budget keeps exactly the affordable priority prefix per stratum") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
      .withColumn("n_tokens",
        size(filter(split(trim($"text"), " "), t => length(t) > 0)).cast("long"))
      .withColumn("prio", Sampling.portableHash($"doc_id") * 1000000L + $"doc_id")
    val budget = 1500L
    val kept = Sampling.takeTokenBudget(docs, "lang", "prio", "n_tokens", budget)
    // budget respected
    val over = kept.groupBy($"lang").agg(max($"tokens_through").as("mx"))
      .filter($"mx" > budget).count()
    assert(over == 0L)
    // prefix property: driver recompute of the greedy walk
    val rows = docs.select($"lang", $"prio", $"doc_id", $"n_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (_, gs) =>
      var run = 0L
      gs.sortBy(_._2).takeWhile { g => run += g._4; run <= budget }.map(_._3)
    }.toSet
    val got = kept.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }
}
