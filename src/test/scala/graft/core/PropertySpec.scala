package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the pure core (SURVEY §5 item 3):
  * splitter coverage/bounds, key stability, UTF-8 truncation safety,
  * JSON-partitioner validity — the properties the DuckDB oracle cannot see
  * because they concern arbitrary inputs, not the fixed test tables.
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property (100 cases) and fail the suite on any
    * counterexample; assertion throws inside the body surface as failures.
    */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100),
      Prop.forAllNoShrink(ga, gb) { (a, b) => body(a, b); true })
    assert(res.passed, res.status.toString)
  }
  private def forAll[A](ga: Gen[A])(body: A => Unit): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100),
      Prop.forAllNoShrink(ga) { a => body(a); true })
    assert(res.passed, res.status.toString)
  }

  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(120, wordGen)
    seps <- Gen.listOfN(120, Gen.frequency(
      (8, Gen.const(" ")), (1, Gen.const("\n")), (1, Gen.const(". "))))
  } yield words.lazyZip(seps).map(_ + _).mkString

  test("recursive split: every chunk within budget, non-empty, in order") {
    forAll(textGen, Gen.choose(4, 64)) { (text, maxTok) =>
      val p = SplitParams(maxTokens = maxTok, overlapTokens = math.min(2, maxTok / 4),
        minChunkTokens = 1)
      val chunks = TextSplitters.recursiveSplit(text, p)
      chunks.foreach { c =>
        assert(c.trim.nonEmpty)
        assert(p.tokenizer.count(c) <= maxTok, s"chunk over budget: '$c'")
      }
      // order: each chunk's leading content occurs in the input at a
      // non-decreasing position (overlap means the next chunk can start
      // before the previous one ends, but never before it starts)
      var pos = 0
      chunks.foreach { c =>
        val at = text.indexOf(c.trim.take(20), pos)
        assert(at >= 0, s"chunk content not found in order: '${c.take(40)}'")
        pos = at
      }
    }
  }

  test("recursive split: chunk token mass covers the input minus overlap slack") {
    forAll(textGen) { text =>
      val p = SplitParams(maxTokens = 32, overlapTokens = 4, minChunkTokens = 1)
      val chunks = TextSplitters.recursiveSplit(text, p)
      val inputTokens = p.tokenizer.count(text)
      val chunkTokens = chunks.map(p.tokenizer.count).sum
      // overlap can only add tokens; splitting must never lose content
      assert(chunkTokens >= inputTokens - chunks.length,
        s"lost tokens: input=$inputTokens chunks=$chunkTokens n=${chunks.length}")
    }
  }

  test("stable chunk keys: deterministic, bounded, key-safe, distinct per chunk id") {
    forAll(Gen.asciiPrintableStr, Gen.choose(0, 99999)) { (url, cid) =>
      val k1 = TextKeys.stableChunkKey(url, cid)
      val k2 = TextKeys.stableChunkKey(url, cid)
      assert(k1 == k2)
      assert(k1.length <= 128 + 7)
      assert(k1.matches("[A-Za-z0-9_-]*-c\\d{5,}"))
      assert(k1 != TextKeys.stableChunkKey(url, cid + 1))
    }
  }

  test("utf8SafeTruncate: never splits a codepoint, respects the byte cap") {
    val unicodeGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const("é"), Gen.const("中"),
      Gen.const("§"), Gen.const("😀"))).map(_.mkString)
    forAll(unicodeGen, Gen.choose(0, 64)) { (s, cap) =>
      val t = TextKeys.utf8SafeTruncate(s, cap)
      val bytes = t.getBytes("UTF-8")
      assert(bytes.length <= cap || s.getBytes("UTF-8").length <= cap)
      // decode→encode round-trip means no split codepoint
      assert(new String(bytes, "UTF-8") == t)
      assert(s.startsWith(t))
    }
  }

  test("JSON partitioner: each part parses, fits budget, concatenation covers input") {
    val jsonGen: Gen[String] = for {
      n <- Gen.choose(1, 30)
      vals <- Gen.listOfN(n, Gen.oneOf(
        wordGen.map(w => s""""$w""""),
        Gen.choose(0, 1000).map(_.toString)))
    } yield vals.mkString("[", ",", "]")
    forAll(jsonGen, Gen.choose(8, 64)) { (js, budget) =>
      val parts = JsonPartitioner.partition(js, budget)
      assert(parts.nonEmpty)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      parts.foreach(part => mapper.readTree(part)) // throws if invalid JSON
      // coverage: every scalar of the input appears in some part
      val scalars = mapper.readTree(js).elements()
      while (scalars.hasNext) {
        val v = scalars.next().asText()
        assert(parts.exists(_.contains(v)), s"value $v lost")
      }
    }
  }

  test("ACL-style capped distinct: order preserved, bounded, idempotent") {
    forAll(Gen.listOf(Gen.choose(0, 20))) { xs =>
      val capped = xs.distinct.take(32)
      assert(capped.length <= 32)
      assert(capped == capped.distinct)
      // order preservation: relative order matches first occurrences
      val firstSeen = xs.distinct
      assert(capped == firstSeen.take(32))
    }
  }
}
