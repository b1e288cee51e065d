package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.Charset

/** X7 charset detection (base_chunker.py:295-306 analog). */
class CharsetsSpec extends AnyFunSuite {

  private def enc(s: String, cs: String): Array[Byte] = s.getBytes(Charset.forName(cs))

  test("BOMs are authoritative and stripped") {
    val utf8bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ enc("héllo", "UTF-8")
    assert(Charsets.detect(utf8bom) == Charsets.Detected("UTF-8", 3))
    assert(Charsets.decodeDetected(utf8bom)._1 == "héllo")
    val le = Array(0xFF, 0xFE).map(_.toByte) ++ enc("hi", "UTF-16LE")
    assert(Charsets.decodeDetected(le) == (("hi", "UTF-16LE")))
    val be = Array(0xFE, 0xFF).map(_.toByte) ++ enc("hi", "UTF-16BE")
    assert(Charsets.decodeDetected(be) == (("hi", "UTF-16BE")))
  }

  test("valid UTF-8 (ascii and multibyte) detects as UTF-8") {
    assert(Charsets.detect(enc("plain", "UTF-8")).charset == "UTF-8")
    assert(Charsets.decodeDetected(enc("日本語 café", "UTF-8")) == (("日本語 café", "UTF-8")))
  }

  test("BOM-less UTF-16 is caught by the NUL heuristic, both endiannesses") {
    assert(Charsets.decodeDetected(enc("bomless utf16 text", "UTF-16LE"))
      == (("bomless utf16 text", "UTF-16LE")))
    assert(Charsets.decodeDetected(enc("bomless utf16 text", "UTF-16BE"))
      == (("bomless utf16 text", "UTF-16BE")))
  }

  test("single-byte Western text falls back to windows-1252 and round-trips") {
    val s = "café résumé £99 – naïve"
    assert(Charsets.decodeDetected(enc(s, "windows-1252")) == ((s, "windows-1252")))
  }

  test("never throws: random bytes, empty, null") {
    assert(Charsets.detect(Array.emptyByteArray).charset == "UTF-8")
    assert(Charsets.decodeDetected(null)._1 == null)
    val junk = Array.tabulate[Byte](64)(i => ((i * 37 + 201) % 256).toByte)
    val (text, cs) = Charsets.decodeDetected(junk)
    assert(text != null && cs.nonEmpty)
  }

  test("short even-length binary payloads do not misdetect as UTF-16") {
    // 0x00 in both parities → neither heuristic branch may fire
    val b = Array[Byte](0, 65, 66, 0, 0, 67, 68, 0, 1, 2)
    assert(Charsets.detect(b).charset == "windows-1252")
  }
}
