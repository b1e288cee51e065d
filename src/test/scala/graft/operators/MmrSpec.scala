package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** MMR diversified rerank: hand-computed greedy on a tiny set, the
  * diversification property on planted clusters (one pick per cluster
  * before any repeat), determinism under repartitioning, and the k/cap
  * edges.
  */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def axis(dim: Int, a: Int): Array[Float] = {
    val v = new Array[Float](dim); v(a) = 1f; v
  }

  private def cands(rows: Seq[(Long, Long, Array[Float], Double)]) =
    rows.toDF("query_id", "id", "vec", "sim")

  test("hand-computed greedy: scores and order") {
    // q=0: three candidates, two identical vectors (ids 1,2) and one
    // orthogonal (id 3). sims: 1 -> 0.9, 2 -> 0.8, 3 -> 0.5; λ = 0.7
    // pick0: id 1, score 0.7·0.9 = 0.63
    // pick1: id 2 gets 0.7·0.8 − 0.3·1 = 0.26; id 3 gets 0.7·0.5 = 0.35 → id 3
    // pick2: id 2 → 0.26
    val out = Search.mmrRerank(cands(Seq(
        (0L, 1L, axis(4, 0), 0.9), (0L, 2L, axis(4, 0), 0.8),
        (0L, 3L, axis(4, 1), 0.5))),
      "query_id", "id", "vec", "sim", k = 3, lambda = 0.7)
      .orderBy($"rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0, 1L, 0.63), (1, 3L, 0.35), (2, 2L, 0.26)))
  }

  test("diversification: one pick per planted cluster before any repeat") {
    // 4 clusters of 5 near-identical vectors; sims in [0.8, 1.0] so the
    // λ=0.7 penalty (−0.3 for a same-cluster repeat) always loses to a
    // fresh cluster: λ·0.8 = 0.56 > λ·1.0 − 0.3 = 0.4
    val rows = for (c <- 0 until 4; i <- 0 until 5) yield {
      val id = (c * 5 + i).toLong
      (0L, id, axis(8, c), 1.0 - 0.01 * id) // sims 1.0 … 0.81
    }
    val out = Search.mmrRerank(cands(rows), "query_id", "id", "vec", "sim",
        k = 8, lambda = 0.7)
      .orderBy($"rank").collect().map(_.getLong(2))
    val firstFour = out.take(4).map(_ / 5).toSet
    assert(firstFour == Set(0L, 1L, 2L, 3L),
      s"first four picks must cover all clusters: ${out.toSeq}")
    // within each cluster the best-sim member (lowest id) is the one picked
    assert(out.take(4).forall(_ % 5 == 0), out.toSeq.toString)
  }

  test("deterministic under repartitioning; multiple queries independent") {
    val rows = for (q <- 0L to 2L; i <- 0 until 30) yield
      (q, i.toLong, axis(16, (i + q.toInt) % 7), 0.5 + (i % 13) / 30.0)
    def run(parts: Int) =
      Search.mmrRerank(cands(rows).repartition(parts), "query_id", "id",
        "vec", "sim", k = 10, lambda = 0.6)
        .orderBy($"query_id", $"rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val a = run(1)
    val b = run(13)
    assert(a.sameElements(b))
    assert(a.count(_._1 == 0L) == 10 && a.count(_._1 == 2L) == 10)
  }

  test("k larger than candidates emits all; cap bounds the group") {
    val out = Search.mmrRerank(cands(Seq(
        (0L, 1L, axis(4, 0), 0.9), (0L, 2L, axis(4, 1), 0.5))),
      "query_id", "id", "vec", "sim", k = 10, lambda = 0.5)
      .collect()
    assert(out.length == 2)
    val capped = Search.mmrRerank(cands((0 until 50).map(i =>
        (0L, i.toLong, axis(4, i % 4), 1.0 - i * 0.001))),
      "query_id", "id", "vec", "sim", k = 50, lambda = 0.5,
      maxCandidates = 10)
      .collect()
    assert(capped.length == 10)
  }
}
