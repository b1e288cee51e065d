package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the single-job histogram quantile path bit-identical to the
  * declarative `percentile` plan — the property that lets t9 run it.
  */
class ExactQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.getString(0))

  test("histogram path equals the declarative percentile plan on documents") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val probs = Seq(0.25, 0.5, 0.75, 0.95)
    val names = Seq("p25", "p50", "p75", "p95")
    val hist = sortedRows(
      ExactQuantiles.byKeyHistogram(docs, "lang", "n_chars", probs, names))
    val decl = sortedRows(
      ExactQuantiles.declarative(docs, "lang", "n_chars", probs, names))
    assert(hist == decl) // exact doubles, not approximate
    assert(hist.nonEmpty)
  }

  test("unrounded doubles still agree (interpolation formula, not rounding)") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val probs = Seq(0.1, 1.0 / 3.0, 0.9)
    val names = Seq("a", "b", "c")
    val hist = sortedRows(ExactQuantiles.byKeyHistogram(
      docs, "lang", "n_chars", probs, names, roundScale = -1))
    val decl = sortedRows(ExactQuantiles.declarative(
      docs, "lang", "n_chars", probs, names, roundScale = -1))
    assert(hist == decl)
  }

  test("maxBins exceeded falls back to the declarative plan (same result)") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
    val probs = Seq(0.5)
    val names = Seq("p50")
    val fb = sortedRows(ExactQuantiles.byKeyHistogram(
      docs, "lang", "n_chars", probs, names, maxBins = 3))
    val decl = sortedRows(
      ExactQuantiles.declarative(docs, "lang", "n_chars", probs, names))
    assert(fb == decl)
  }

  test("null values: n counts all rows, quantiles skip nulls, all-null key null") {
    val df = Seq[(String, java.lang.Long)](
      ("a", 10L), ("a", null), ("a", 20L), ("a", 30L),
      ("b", null), ("b", null),
      ("c", 7L)).toDF("k", "v")
    val hist = sortedRows(ExactQuantiles.byKeyHistogram(
      df, "k", "v", Seq(0.5), Seq("p50")))
    val decl = sortedRows(ExactQuantiles.declarative(
      df, "k", "v", Seq(0.5), Seq("p50")))
    assert(hist == decl)
    val a = hist.find(_.getString(0) == "a").get
    assert(a.getLong(1) == 4L && a.getDouble(2) == 20.0)
    val b = hist.find(_.getString(0) == "b").get
    assert(b.getLong(1) == 2L && b.isNullAt(2))
  }

  test("null KEYS are a real group on both paths (no NPE, declarative parity)") {
    val df = Seq[(String, java.lang.Long)](
      (null, 5L), (null, 15L), ("a", 10L)).toDF("k", "v")
    val hist = ExactQuantiles.byKeyHistogram(
        df, "k", "v", Seq(0.5), Seq("p50"))
      .collect().toSeq.sortBy(r => Option(r.getString(0)))
    val decl = ExactQuantiles.declarative(
        df, "k", "v", Seq(0.5), Seq("p50"))
      .collect().toSeq.sortBy(r => Option(r.getString(0)))
    assert(hist == decl)
    assert(hist.exists(r => r.isNullAt(0) && r.getDouble(2) == 10.0))
  }

  test("maxBins fallback keeps the histogram path's key type and order for int keys") {
    val df = Seq((3, 30L), (1, 10L), (2, 20L), (1, 12L)).toDF("k", "v")
    val fb = ExactQuantiles.byKeyHistogram(
      df, "k", "v", Seq(0.5), Seq("p50"), maxBins = 1)
    val hist = ExactQuantiles.byKeyHistogram(
      df, "k", "v", Seq(0.5), Seq("p50"))
    // same shape (name, type) and the same sorted rows on BOTH paths —
    // the contract must not flip with data volume
    assert(fb.schema.map(f => (f.name, f.dataType)) ==
      hist.schema.map(f => (f.name, f.dataType)))
    assert(fb.collect().toSeq == hist.collect().toSeq)
    assert(fb.head().getString(0) == "1")
  }

  test("exact boundary ranks: p=0, p=1, two-element interpolation") {
    val df = Seq(("k", 1L), ("k", 2L)).toDF("k", "v")
    val r = ExactQuantiles.byKeyHistogram(
      df, "k", "v", Seq(0.0, 0.25, 1.0), Seq("q0", "q25", "q1")).head()
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.25 && r.getDouble(4) == 2.0)
  }
}
