package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The trained quality classifier (t15): learnability on a separable
  * planted corpus, training determinism (the cross-engine rounding
  * contract), generalization to unseeded docs, and the map-only scoring
  * plan (broadcast weights — no shuffle, no join).
  */
class QualityLrSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // a separable corpus: "good" docs share one vocabulary, "bad" docs
  // another; the planted rule is the label
  private lazy val toy = (0 until 120).map { i =>
    val good = i % 2 == 0
    val base = if (good) "signal alpha beta clean prose sentence"
    else "noise junk spam gamma delta garbled"
    (i.toLong, s"$base token$i filler", good)
  }.toDF("doc_id", "text", "is_good")

  test("learns a separable planted rule and generalizes to unseeded docs") {
    // train on a third of the corpus, score everything
    val model = TextAnalysis.trainQualityLr(toy, "doc_id", "text",
      $"is_good", $"doc_id" % 3 === 0, epochs = 30, lr = 8.0)
    val scored = TextAnalysis.scoreQualityLr(toy, "doc_id", "text", model)
      .join(toy.select($"doc_id".as("id"), $"is_good"), Seq("id"))
      .localCheckpoint(true)
    assert(scored.count() == 120)
    val agg = scored.groupBy($"is_good")
      .agg(avg($"quality_score").as("m"), min($"quality_score").as("lo"),
        max($"quality_score").as("hi"))
      .collect().map(r => r.getBoolean(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(agg(true)._1 > 0.8, s"good docs score high: ${agg(true)}")
    assert(agg(false)._1 < 0.2, s"bad docs score low: ${agg(false)}")
    // full separation, including the docs the seed slice never saw
    assert(agg(true)._2 > agg(false)._3,
      s"min(good)=${agg(true)._2} must exceed max(bad)=${agg(false)._3}")
  }

  test("training is deterministic (weights bit-identical across runs)") {
    val m1 = TextAnalysis.trainQualityLr(toy, "doc_id", "text",
      $"is_good", $"doc_id" % 3 === 0, epochs = 4)
    val m2 = TextAnalysis.trainQualityLr(toy, "doc_id", "text",
      $"is_good", $"doc_id" % 3 === 0, epochs = 4)
    assert(m1.weights.toSeq == m2.weights.toSeq)
    // every weight is 6-dp quantized (the cross-engine contract)
    assert(m1.weights.forall(w =>
      java.math.BigDecimal.valueOf(w).setScale(6,
        java.math.RoundingMode.HALF_UP).doubleValue() == w))
  }

  test("scoring is map-only: no shuffle, no join in the plan") {
    val model = TextAnalysis.trainQualityLr(toy, "doc_id", "text",
      $"is_good", $"doc_id" % 3 === 0, epochs = 2)
    val plan = TextAnalysis.scoreQualityLr(toy, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"scoring must not join:\n$plan")
  }

  test("empty docs drop from scoring (the oracle's missing feature rows)") {
    val withEmpty = toy.unionByName(
      Seq((999L, "   ", false), (998L, "", false))
        .toDF("doc_id", "text", "is_good"))
    val model = TextAnalysis.trainQualityLr(withEmpty, "doc_id", "text",
      $"is_good", lit(true), epochs = 1)
    val scored = TextAnalysis.scoreQualityLr(withEmpty, "doc_id", "text", model)
    assert(scored.count() == 120)
    assert(scored.filter($"id" >= 998L).isEmpty)
  }
}
