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

  test("binaryAuc: exact mid-rank AUC on a hand case with ties") {
    // scores asc: 0.1(neg) 0.2(pos,neg tie) 0.9(pos)
    // ranks: 1, {2,3}→2.5 each, 4; rankSum(pos)=2.5+4=6.5
    // AUC = (6.5 - 2*3/2) / (2*2) = 3.5/4 = 0.875
    val df = Seq((0.1, false), (0.2, true), (0.2, false), (0.9, true))
      .toDF("s", "y")
    assert(TextAnalysis.binaryAuc(df, "s", "y") == 0.875)
    // degenerate single-class input is NaN, not a crash
    assert(TextAnalysis.binaryAuc(df.filter($"y"), "s", "y").isNaN)
  }

  test("held-out evaluation: grouped-split AUC beats the untrained baseline") {
    // the evaluation discipline the hash-matched training path can't
    // prove: split by GROUP (sp8 — near-dups can't straddle the
    // boundary), train ONLY on the train split, measure ranking quality
    // on docs the trainer never saw
    val grouped = toy.withColumn("family", concat(lit("f"), $"doc_id" % 12))
    val split = Sampling.groupedSplit(grouped, "family",
      valPerMille = 0, testPerMille = 300).localCheckpoint(true)
    val model = TextAnalysis.trainQualityLr(split, "doc_id", "text",
      $"is_good", $"split" === "train", epochs = 30, lr = 8.0)
    val heldOut = split.filter($"split" === "test")
    assert(heldOut.count() > 10, "fixture: the test split must be real")
    val scored = TextAnalysis.scoreQualityLr(heldOut, "doc_id", "text", model)
      .join(heldOut.select($"doc_id".as("id"), $"is_good"), Seq("id"))
    val auc = TextAnalysis.binaryAuc(scored, "quality_score", "is_good")
    // untrained baseline: the zero-weight model scores every doc 0.5 —
    // AUC exactly 0.5 by the mid-rank convention
    val base = TextAnalysis.scoreQualityLr(heldOut, "doc_id", "text",
      TextAnalysis.QualityLrModel(
        new Array[Double](model.buckets + 1), model.buckets))
      .join(heldOut.select($"doc_id".as("id"), $"is_good"), Seq("id"))
    val baseAuc = TextAnalysis.binaryAuc(base, "quality_score", "is_good")
    assert(baseAuc == 0.5, s"zero model is chance: $baseAuc")
    assert(auc > 0.95, s"held-out AUC must show real ranking power: $auc")
  }

  test("held-out harness DETECTS an unlearnable label on the real documents table") {
    // the synthetic corpus shares ONE 31-token vocabulary across all
    // languages (verified in DuckDB), so lang is lexically unlearnable
    // from unigram features BY CONSTRUCTION — the evaluation harness
    // must say so (held-out AUC ≈ chance) even though training runs and
    // the per-doc scores hash-match. This is the half of a trained
    // classifier the t15 determinism gate cannot see: a converged,
    // reproducible, USELESS model, caught by the grouped-split AUC.
    val docs = graft.Tables.load(spark, graft.TestSpark.sf, "documents")
      .withColumn("is_en", $"lang" === "en")
    val split = Sampling.groupedSplit(docs, "source",
      valPerMille = 0, testPerMille = 300).localCheckpoint(true)
    val heldOut = split.filter($"split" === "test")
    assert(heldOut.count() > 20, "fixture: held-out slice must be real")
    val model = TextAnalysis.trainQualityLr(split, "doc_id", "text",
      $"is_en", $"split" === "train", epochs = 8, lr = 2.0)
    val scored = TextAnalysis.scoreQualityLr(heldOut, "doc_id", "text", model)
      .join(heldOut.select($"doc_id".as("id"), $"is_en"), Seq("id"))
    val auc = TextAnalysis.binaryAuc(scored, "quality_score", "is_en")
    assert(auc > 0.35 && auc < 0.65,
      s"an unlearnable label must read as chance, not signal: $auc")
  }

  // ---- the graded head (t15b) ----

  // three vocabulary tiers → planted grades 1 / 3 / 5
  private lazy val gradedToy = (0 until 150).map { i =>
    val tier = i % 3
    val base = tier match {
      case 0 => "noise junk spam garbled mess clutter"
      case 1 => "plain ordinary text average middling prose"
      case _ => "lucid rigorous insightful educational exemplary exposition"
    }
    (i.toLong, s"$base token$i filler", 1 + 2 * tier)
  }.toDF("doc_id", "text", "grade_true")

  test("graded head learns a planted 1/3/5 rubric; grades clamp to [0,5]") {
    // lr below the full-batch stability boundary (the bias feature alone
    // has curvature ~1, so lr = 2.0 oscillates forever on a linear head)
    val model = TextAnalysis.trainQualityGrades(gradedToy, "doc_id", "text",
      $"grade_true", $"doc_id" % 3 < 3, epochs = 200, lr = 1.0)
    val scored = TextAnalysis.scoreQualityGrades(gradedToy, "doc_id", "text",
        model)
      .join(gradedToy.select($"doc_id".as("id"), $"grade_true"), Seq("id"))
      .localCheckpoint(true)
    assert(scored.filter($"grade" < 0 || $"grade" > 5).isEmpty)
    val mae = scored.agg(avg(abs($"grade" - $"grade_true"))).head().getDouble(0)
    assert(mae < 0.5, s"tier rubric must be learnable: MAE $mae")
    // monotone: per-tier mean scores order with the rubric
    val m = scored.groupBy($"grade_true").agg(avg($"grade_score").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m(1) < m(3) && m(3) < m(5), s"tier means must order: $m")
  }

  test("grade-cut calibration: argmax-F1 on a separable corpus recovers the planted keep cut") {
    // the t15c claim the gate's hash-match can't prove: on a corpus the
    // head CAN learn (marker-token frequency linear in the grade — fixed
    // 50-token docs, grade·8 'edu' markers), the per-cut confusion/PR
    // table's unique argmax-F1 row is the planted rule's own cut (≥ 3,
    // the FineWeb-Edu keep rule). Simulated convergence: epochs=16,
    // lr=0.5 reaches F1=1.0 at cut 3 with margin over every other cut.
    val fillers = Array("alpha", "beta", "gamma", "delta", "eps")
    val planted = (0 until 600).map { i =>
      val g = i % 6
      val toks = Seq.fill(g * 8)("edu") ++
        (0 until 50 - g * 8).map(j => fillers((i + j) % 5))
      (i.toLong, toks.mkString(" "), g)
    }.toDF("doc_id", "text", "grade_true")
    val model = TextAnalysis.trainQualityGrades(planted, "doc_id", "text",
      $"grade_true", $"doc_id" % 3 === 0, epochs = 16, lr = 0.5)
    val held = planted.filter($"doc_id" % 3 =!= 0)
    val scored = TextAnalysis.scoreQualityGrades(held, "doc_id", "text",
        model)
      .join(held.select($"doc_id".as("id"), ($"grade_true" >= 3).as("pos")),
        Seq("id"))
    val table = TextAnalysis.gradeCutCalibration(scored, "grade", $"pos")
      .orderBy($"cut").collect()
    assert(table.length == 6)
    // internal consistency: every row partitions the same held-out set
    val n = table.head.getLong(1) + table.head.getLong(2) +
      table.head.getLong(3) + table.head.getLong(4)
    assert(table.forall(r => r.getLong(1) + r.getLong(2) + r.getLong(3) +
      r.getLong(4) == n))
    // cut 0 keeps everything: recall 1, tn 0
    assert(table.head.getInt(0) == 0 && table.head.getLong(4) == 0L)
    val optimal = table.filter(_.getBoolean(8)).map(_.getInt(0)).toSeq
    assert(optimal == Seq(3),
      s"argmax-F1 must uniquely recover the planted keep cut: $optimal")
    val f1At3 = table.find(_.getInt(0) == 3).get.getDouble(7)
    assert(f1At3 == 1.0, s"the learnable rubric calibrates exactly: $f1At3")
  }

  test("graded-head training is deterministic and 6-dp quantized") {
    val m1 = TextAnalysis.trainQualityGrades(gradedToy, "doc_id", "text",
      $"grade_true", $"doc_id" % 3 === 0, epochs = 4)
    val m2 = TextAnalysis.trainQualityGrades(gradedToy, "doc_id", "text",
      $"grade_true", $"doc_id" % 3 === 0, epochs = 4)
    assert(m1.weights.toSeq == m2.weights.toSeq)
    assert(m1.weights.forall(w =>
      java.math.BigDecimal.valueOf(w).setScale(6,
        java.math.RoundingMode.HALF_UP).doubleValue() == w))
  }
}
