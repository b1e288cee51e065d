package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (AND semantics) and reciprocal-rank fusion. */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("AND semantics: only docs containing every query term score") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana"),
      (3L, "apple apple banana cherry cherry")
    ).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text",
      Seq("apple", "cherry"), k = 10).select($"id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L), "doc 2 lacks 'cherry' and must be excluded")
  }

  test("term frequency raises the score; rare terms outweigh common ones") {
    val docs = Seq(
      (1L, "target filler filler filler"),
      (2L, "target target filler filler"),
      (3L, "filler filler filler filler")
    ).toDF("doc_id", "text")
    val scores = Search.bm25TopK(docs, "doc_id", "text", Seq("target"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(2L) > scores(1L), "higher tf must score higher")
    assert(!scores.contains(3L))
  }

  test("rrf fusion rewards presence in both rankings and is deterministic") {
    val a = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("id", "sa")
    val b = Seq((2L, 0.95), (4L, 0.5)).toDF("id", "sb")
    val got = Search.rrfFuse(a, b, "id", "sa", "sb", k = 10)
      .select($"id", $"rrf").collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.head._1 == 2L, "doc in both lists must rank first")
    // 2 is rank 2 in a, rank 1 in b: 1/62 + 1/61
    assert(math.abs(got.head._2 - (1.0 / 62 + 1.0 / 61)) < 1e-5)
    val again = Search.rrfFuse(a, b, "id", "sa", "sb", k = 10)
      .select($"id", $"rrf").collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.toSeq == again.toSeq)
  }

  test("bm25 top-k plans as TakeOrderedAndProject (bounded top-k, no global sort)") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
    val p = Search.bm25TopK(docs, "doc_id", "text", Seq("spark"), 10)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }
}
