package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Benchmark decontamination as a transform (dc2): broadcast bench-gram
  * probe, island merge, rebuild — against hand-computed expectations.
  * Unlike the dedup variant there is NO keeper: every matched corpus
  * occurrence is cut, including the first.
  */
class DecontamSpansSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def run(corpus: Seq[(Long, String)], bench: Seq[(Long, String)],
      k: Int = 3) =
    Quality.removeContaminatedSpans(corpus.toDF("doc_id", "text"),
        bench.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("a leaked passage comes out as one merged hole") {
    val got = run(
      corpus = Seq(1L -> "x a b c d y", 2L -> "u v w"),
      bench = Seq(100L -> "a b c d"))
    // bench grams "a b c" and "b c d" match at positions 1 and 2 of doc 1;
    // intervals [1,3] and [2,4] merge to one span
    assert(got(1L) == ((1L, 4L, "x y")))
    assert(got(2L) == ((0L, 0L, "u v w")))
  }

  test("every occurrence is cut — there is no keeper in decontamination") {
    val got = run(
      corpus = Seq(1L -> "a b c z a b c"),
      bench = Seq(100L -> "a b c"))
    assert(got(1L) == ((2L, 6L, "z")))
  }

  test("two separate leaks stay two spans") {
    val got = run(
      corpus = Seq(1L -> "a b c m1 m2 m3 d e f"),
      bench = Seq(100L -> "a b c", 101L -> "d e f"))
    assert(got(1L) == ((2L, 6L, "m1 m2 m3")))
  }

  test("short, empty, and clean docs pass through untouched") {
    val got = run(
      corpus = Seq(1L -> "a b", 2L -> "", 3L -> "p  q   r"),
      bench = Seq(100L -> "a b c"))
    assert(got(1L) == ((0L, 0L, "a b")))
    assert(got(2L) == ((0L, 0L, "")))
    // whitespace normalizes in the rebuilt stream
    assert(got(3L) == ((0L, 0L, "p q r")))
  }

  test("a fully leaked document empties out") {
    val got = run(
      corpus = Seq(1L -> "q r s t"),
      bench = Seq(100L -> "z q r s t z"))
    assert(got(1L) == ((1L, 4L, "")))
  }

  test("bench docs shorter than k contribute no grams") {
    val got = run(
      corpus = Seq(1L -> "a b c d"),
      bench = Seq(100L -> "a b"))
    assert(got(1L) == ((0L, 0L, "a b c d")))
  }
}
