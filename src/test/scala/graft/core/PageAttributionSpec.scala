package graft.core

import org.scalatest.funsuite.AnyFunSuite

class PageAttributionSpec extends AnyFunSuite {
  private val M = PageAttribution.RawMarker

  test("numberMarkers: sequential 5-digit numbering from a start page") {
    val (out, n) = PageAttribution.numberMarkers(s"a$M b$M c", firstPage = 1)
    assert(n == 2)
    assert(out == "a<!-- PageBreak00001 --> b<!-- PageBreak00002 --> c")
    val (out2, _) = PageAttribution.numberMarkers(s"x$M y", firstPage = 42)
    assert(out2.contains("PageBreak00042"))
  }

  test("renumberParts: continuous numbering across split-PDF parts") {
    val parts = Seq(s"p1$M p2$M p3", s"$M p4$M p5")
    val joined = PageAttribution.renumberParts(parts)
    val nums = """PageBreak(\d{5})""".r.findAllMatchIn(joined).map(_.group(1).toInt).toSeq
    assert(nums == Seq(1, 2, 3, 4))
  }

  test("attributePages: <50% rule decides new vs carried page") {
    val m1 = "<!-- PageBreak00001 -->"
    // marker at position 0 (< half) → chunk belongs to the NEW page (2)
    val early = Seq(s"${m1}almost all of this chunk is after the break")
    assert(PageAttribution.attributePages(early) == Seq(2))
    // marker late in the chunk (> half) → chunk stays on the carried page (1)
    val late = Seq(s"almost all of this chunk is before the break$m1")
    assert(PageAttribution.attributePages(late) == Seq(1))
    // carried state advances for the following chunk either way
    val two = Seq(s"lots of text before the marker sits here$m1", "continuation text")
    assert(PageAttribution.attributePages(two) == Seq(1, 2))
  }

  test("multi-marker chunk: first marker attributes, last marker carries") {
    val c = "<!-- PageBreak00003 -->mid<!-- PageBreak00004 -->tail"
    val pages = PageAttribution.attributePages(Seq(c, "next chunk"))
    assert(pages == Seq(4, 5))
  }

  test("stripMarkers removes numbered and raw markers") {
    val s = s"a<!-- PageBreak00007 -->b${M}c"
    assert(PageAttribution.stripMarkers(s) == "abc")
  }

  test("property: page sequence is nondecreasing and bounded by marker count") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val nPages = 2 + rnd.nextInt(6)
      val raw = (1 to nPages).map(p => s"content of page $p " * (1 + rnd.nextInt(8)))
        .mkString(M)
      val (numbered, n) = PageAttribution.numberMarkers(raw)
      assert(n == nPages - 1)
      val chunks = TextSplitters.recursiveSplit(numbered,
        SplitParams(maxTokens = 16, overlapTokens = 0, minChunkTokens = 1))
      val pages = PageAttribution.attributePages(chunks)
      assert(pages == pages.sorted, s"pages must be nondecreasing: $pages")
      assert(pages.head >= 1 && pages.last <= nPages)
    }
  }
}
