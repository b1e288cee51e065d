package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Exact substring-span dedup (d17): window fingerprinting, keeper rule,
  * island merge, and rebuild — all against hand-computed expectations.
  */
class DedupSpansSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], w: Int = 3) =
    Dedup.removeDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        windowTokens = w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("cross-doc duplicated run: first doc keeps, second loses the merged span") {
    val got = run(Seq(1L -> "a b c d e f", 2L -> "x a b c d y"))
    // windows "a b c" and "b c d" are duplicated; doc 1 is the keeper for
    // both. Doc 2's covered intervals [1,3] and [2,4] merge to one span.
    assert(got(1L) == ((0L, 0L, "a b c d e f")))
    assert(got(2L) == ((1L, 4L, "x y")))
  }

  test("within-doc repetition: every occurrence after the first is cut") {
    val got = run(Seq(3L -> "p q r p q r p q"))
    // duplicated windows at positions 3,4,5 merge to the span [3,7]
    assert(got(3L) == ((1L, 5L, "p q r")))
  }

  test("keeper is min (doc, pos): a lower doc id wins even at a later offset") {
    val got = run(Seq(6L -> "z1 z2 z3 m n o", 7L -> "m n o w"))
    assert(got(6L) == ((0L, 0L, "z1 z2 z3 m n o")))
    assert(got(7L) == ((1L, 3L, "w")))
  }

  test("docs shorter than the window and empty docs pass through untouched") {
    val got = run(Seq(4L -> "solo short", 5L -> "", 8L -> "   "))
    assert(got(4L) == ((0L, 0L, "solo short")))
    assert(got(5L) == ((0L, 0L, "")))
    assert(got(8L) == ((0L, 0L, "")))
  }

  test("a fully duplicated document empties out") {
    val got = run(Seq(10L -> "one two three four", 11L -> "one two three four"))
    assert(got(10L) == ((0L, 0L, "one two three four")))
    assert(got(11L) == ((1L, 4L, "")))
  }

  test("disjoint duplicated regions stay separate spans") {
    // doc 21 duplicates doc 20's opening AND doc 20's tail, with a unique
    // middle — two islands, not one
    val got = run(Seq(
      20L -> "a b c G1 G2 G3 x y z",
      21L -> "a b c m1 m2 m3 x y z"))
    assert(got(20L) == ((0L, 0L, "a b c G1 G2 G3 x y z")))
    assert(got(21L) == ((2L, 6L, "m1 m2 m3")))
  }
}
