package graft.formats

import org.scalatest.funsuite.AnyFunSuite

/** USTAR codec: round-trip, determinism, size arithmetic, header
  * structure (magic/checksum), and malformed-input totality.
  */
class TarSpec extends AnyFunSuite {

  private def entries(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map(i => (f"$i%08d-doc.txt",
      Array.tabulate[Byte](13 * (i + 7))(j => ((i * 31 + j) % 256).toByte)))

  test("round-trip: names, order, and bytes survive archive -> list") {
    val es = entries(9) :+ (("empty.txt", Array.empty[Byte]))
    val tar = Tar.archive(es)
    val back = Tar.list(tar).get
    assert(back.length == es.length)
    back.zip(es).foreach { case ((gn, gb), (wn, wb)) =>
      assert(gn == wn && gb.sameElements(wb), s"member $wn differs")
    }
  }

  test("byte-deterministic; archiveBytes matches the real size exactly") {
    val es = entries(6)
    val a = Tar.archive(es)
    val b = Tar.archive(es)
    assert(a.sameElements(b))
    assert(a.length.toLong == Tar.archiveBytes(es.map(_._2.length.toLong)))
    // member sizes at the 512 boundary: 511/512/513 pad to 512/512/1024
    assert(Tar.archiveBytes(Seq(511L)) == 512 + 512 + 1024)
    assert(Tar.archiveBytes(Seq(512L)) == 512 + 512 + 1024)
    assert(Tar.archiveBytes(Seq(513L)) == 512 + 1024 + 1024)
    assert(Tar.archiveBytes(Seq.empty) == 1024)
  }

  test("ustar header structure: magic, version, checksum") {
    val tar = Tar.archive(Seq(("a.txt", "hello".getBytes("UTF-8"))))
    // magic "ustar\0" + version "00" at offset 257
    assert(new String(tar, 257, 5, "US-ASCII") == "ustar" && tar(262) == 0)
    assert(tar(263) == '0' && tar(264) == '0')
    // recompute the checksum with the field blanked — must match
    val hdr = tar.take(512).clone()
    val stored = java.lang.Long.parseLong(
      new String(hdr, 148, 6, "US-ASCII"), 8)
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    assert(hdr.map(_ & 0xff).sum.toLong == stored)
    // size field is octal
    assert(java.lang.Long.parseLong(
      new String(tar, 124, 11, "US-ASCII"), 8) == 5L)
  }

  test("hostile inputs list to None, never throw") {
    val good = Tar.archive(entries(3))
    val cases: Seq[Array[Byte]] = Seq(
      null,
      Array.fill[Byte](513)(1),            // not block-aligned
      Array.fill[Byte](512)(0x41),         // garbage size field
      good.take(good.length - 1024),       // trailer stripped
      { val b = good.clone(); b(124) = 'x'; b }) // corrupt size
    cases.foreach(c => Tar.list(c)) // totality
    assert(Tar.list(Array.fill[Byte](513)(1)).isEmpty)
    assert(Tar.list(good.take(good.length - 1024)).isEmpty)
    assert(Tar.list(Array.fill[Byte](512)(0x41)).isEmpty)
  }

  test("name length is enforced") {
    intercept[IllegalArgumentException] {
      Tar.archive(Seq(("x" * 101, Array.empty[Byte])))
    }
  }
}
