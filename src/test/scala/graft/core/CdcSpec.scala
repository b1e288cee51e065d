package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking: coverage, bounds, and the property the whole
  * construction exists for — boundary stability under edits.
  */
class CdcSpec extends AnyFunSuite {

  private def sampleTexts: Seq[String] = {
    val spark = graft.TestSpark.spark
    spark.read.parquet(s"${graft.TestSpark.sf}/documents.parquet")
      .select("text").limit(30).collect().map(_.getString(0)).filter(_.nonEmpty).toSeq
  }

  test("chunks concatenate back to the original text") {
    sampleTexts.foreach { t =>
      assert(Cdc.chunks(t).mkString == t)
    }
  }

  test("every chunk respects min/max bounds except a short final tail") {
    sampleTexts.foreach { t =>
      val cs = Cdc.chunks(t, minLen = 32, maxLen = 512)
      cs.dropRight(1).foreach { c =>
        assert(c.length >= 32 && c.length <= 512, s"bad chunk length ${c.length}")
      }
      assert(cs.last.length <= 512)
    }
  }

  test("empty text yields no chunks; short text yields itself") {
    assert(Cdc.chunks("") == Vector.empty)
    assert(Cdc.chunks("tiny") == Vector("tiny"))
  }

  test("deterministic") {
    sampleTexts.take(5).foreach(t => assert(Cdc.chunks(t) == Cdc.chunks(t)))
  }

  test("a prefix edit reshapes only leading chunks — the tails resynchronize") {
    // THE content-defined property: fixed-size chunking would shift every
    // boundary after the insertion; CDC boundaries depend on local content,
    // so the chunk streams must re-align shortly after the edit.
    // sf0.001 docs are short; splice consecutive docs into long ones
    val texts = sampleTexts.grouped(5).map(_.mkString(" ")).filter(_.length >= 800)
      .take(6).toSeq
    assert(texts.nonEmpty, "fixture needs some long docs")
    texts.foreach { t =>
      val orig = Cdc.chunks(t)
      val edited = Cdc.chunks("INSERTED PREFIX EDIT " + t)
      val common = orig.reverse.zip(edited.reverse).takeWhile { case (a, b) => a == b }.size
      assert(common >= orig.size / 2,
        s"only $common of ${orig.size} trailing chunks survived a prefix edit")
    }
  }

  test("an interior edit leaves chunks before AND after the edit region intact") {
    val texts = sampleTexts.grouped(6).map(_.mkString(" ")).filter(_.length >= 1000)
      .take(4).toSeq
    assert(texts.nonEmpty, "fixture needs some long docs")
    texts.foreach { t =>
      val mid = t.length / 2
      val edited = t.substring(0, mid) + " XX " + t.substring(mid)
      val a = Cdc.chunks(t)
      val b = Cdc.chunks(edited)
      val prefix = a.zip(b).takeWhile { case (x, y) => x == y }.size
      val suffix = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.size
      assert(prefix + suffix >= a.size - 3,
        s"edit at one point disturbed more than 3 chunks (prefix=$prefix suffix=$suffix of ${a.size})")
    }
  }
}
