package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** The explicit-vocabulary bigram LM (t13): training determinism, exact
  * hand-computed probabilities on a tiny corpus, stupid backoff, and the
  * property hashed unigrams can't have — word-ORDER sensitivity.
  */
class BigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(rows: Seq[(Long, String, Boolean)]) = {
    import spark.implicits._
    rows.toDF("id", "text", "is_ref")
  }

  test("hand-computed model on a tiny corpus") {
    import spark.implicits._
    // ref corpus: "a b a b c" + "a b" → unigrams a:3 b:3 c:1 (n=7)
    // bigrams: (a,b):3 (b,a):1 (b,c):1 → pruned at 2: only (a,b):3
    val d = df(Seq((1L, "a b a b c", true), (2L, "a b", true),
      (3L, "a b z", false)))
    val lm = TextAnalysis.trainBigramLm(d, "text", $"is_ref",
      vocabSize = 10, minBigramCount = 2, alpha = 0.4)
    assert(lm.nRef == 7 && lm.vocab == Map("a" -> 3L, "b" -> 3L, "c" -> 1L))
    assert(lm.oovCount == 0)
    assert(lm.bigrams.size == 1)
    val v = 3 // vocab size
    // p_uni(a) = (3+1)/(7+3+1); seen bigram p(b|a) = 3/3; backoff
    // p(c|b) = 0.4 · (1+1)/11
    assert(math.abs(lm.lnUni("a") - math.log(4.0 / 11)) < 1e-12)
    assert(math.abs(lm.lnCond("a", "b") - math.log(1.0)) < 1e-12)
    assert(math.abs(lm.lnCond("b", "c") - (math.log(0.4) + math.log(2.0 / 11))) < 1e-12)
    // OOV scores as UNK with the full OOV mass (here 0 → add-1 floor)
    assert(math.abs(lm.lnUni("zzz") - math.log(1.0 / 11)) < 1e-12)
    // score("a b") = -(ln p_uni(a) + ln p(b|a)) / 2
    val (n, nll) = lm.score("a b")
    assert(n == 2L)
    assert(math.abs(nll - (-(math.log(4.0 / 11) + 0.0) / 2)) < 1e-12)
  }

  test("vocab cap keeps the top-V by (count desc, token asc)") {
    import spark.implicits._
    // counts: x:3, y:3, z:2, w:2 — V=3 must keep x, y (ties by token) and
    // then z,w tie at 2 → 'w' < 'z' keeps w
    val d = df(Seq((1L, "x y x y x y z z w w", true)))
    val lm = TextAnalysis.trainBigramLm(d, "text", $"is_ref", vocabSize = 3)
    assert(lm.vocab.keySet == Set("x", "y", "w"))
    assert(lm.oovCount == 2) // the two z occurrences share UNK
  }

  test("maxBigramTable caps the driver table at the top-K by (count desc, key asc)") {
    import spark.implicits._
    // bigram counts: (a,b):4 (b,a):3 (b,c):1 (c,a):1 — cap 2 must keep
    // (a,b) and (b,a); below-cap training is byte-identical to uncapped
    val d = df(Seq((1L, "a b a b a b c a b a", true)))
    val full = TextAnalysis.trainBigramLm(d, "text", $"is_ref",
      vocabSize = 10, minBigramCount = 1)
    val capped = TextAnalysis.trainBigramLm(d, "text", $"is_ref",
      vocabSize = 10, minBigramCount = 1, maxBigramTable = 2)
    assert(full.bigrams.size == 4)
    assert(capped.bigrams.size == 2)
    val topTwo = full.bigrams.toSeq.sortBy { case (k, c) => (-c, k) }.take(2).toMap
    assert(capped.bigrams == topTwo)
    // a cap larger than the table is a no-op
    val loose = TextAnalysis.trainBigramLm(d, "text", $"is_ref",
      vocabSize = 10, minBigramCount = 1, maxBigramTable = 1000)
    assert(loose.bigrams == full.bigrams && loose.vocab == full.vocab)
  }

  test("word order changes the score; hashed unigrams would not see it") {
    import spark.implicits._
    // ref has a strong "the cat sat" pattern; a permuted doc must score
    // strictly worse even though its unigram bag is identical
    val ref = (1 to 50).map(i => (i.toLong, "the cat sat on the mat", true))
    val d = df(ref ++ Seq((100L, "the cat sat on the mat", false),
      (101L, "mat the on sat cat the", false)))
    val lm = TextAnalysis.trainBigramLm(d, "text", $"is_ref",
      vocabSize = 100, minBigramCount = 2)
    val natural = lm.score("the cat sat on the mat")._2
    val shuffled = lm.score("mat the on sat cat the")._2
    assert(natural < shuffled - 0.5,
      s"natural $natural should beat shuffled $shuffled clearly")
  }

  test("bigramPerplexity scores every non-empty doc; partitioning-invariant") {
    import spark.implicits._
    val rows = (0 until 40).map { i =>
      (i.toLong, if (i % 3 == 0) "alpha beta gamma alpha beta" else "beta alpha noise" + i,
        i % 2 == 0)
    } :+ (99L, "", false) :+ (98L, "   ", false)
    val d1 = df(rows).repartition(1)
    val d8 = df(rows).repartition(8)
    val r1 = TextAnalysis.bigramPerplexity(d1, "id", "text", $"is_ref")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val r8 = TextAnalysis.bigramPerplexity(d8, "id", "text", $"is_ref")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r1.sameElements(r8))
    // empty/blank docs are excluded, everything else scored
    assert(r1.length == 40)
    assert(r1.forall(_._2 > 0))
  }
}
