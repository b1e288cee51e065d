package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TextKeysSpec extends AnyFunSuite {
  test("titleFromFilename: ext strip, separators, camelCase (X1)") {
    assert(TextKeys.titleFromFilename("annual_report-2024.pdf") == "Annual Report 2024")
    assert(TextKeys.titleFromFilename("myCamelCaseDoc.docx") == "My Camel Case Doc")
    assert(TextKeys.titleFromFilename("plain.txt") == "Plain")
  }

  test("sanitizeKey: collapse and trim non-key chars (X2)") {
    assert(TextKeys.sanitizeKey("https://acme.blob/a b/c.pdf") == "https-acme-blob-a-b-c-pdf")
    assert(TextKeys.sanitizeKey("--weird--key--") == "weird-key")
    assert(TextKeys.sanitizeKey("ok_name-1") == "ok_name-1")
  }

  test("stableChunkKey: format, determinism, bounded length (X3)") {
    val k = TextKeys.stableChunkKey("container/folder/file.pdf", 7)
    assert(k.endsWith("-c00007"))
    assert(k == TextKeys.stableChunkKey("container/folder/file.pdf", 7))
    val long = "x" * 300
    val lk = TextKeys.stableChunkKey(long, 3)
    assert(lk.length <= 128 + 7)
    // distinct long urls must not collide after shortening
    val lk2 = TextKeys.stableChunkKey("x" * 299 + "y", 3)
    assert(lk != lk2)
  }

  test("utf8SafeTruncate never splits a codepoint (X4)") {
    val s = "héllo wörld 你好世界" // mixed 1/2/3-byte chars
    for (max <- 1 to s.getBytes("UTF-8").length) {
      val t = TextKeys.utf8SafeTruncate(s, max)
      assert(t.getBytes("UTF-8").length <= max)
      assert(s.startsWith(t)) // valid prefix, no replacement chars
    }
    assert(TextKeys.utf8SafeTruncate("abc", 100) == "abc")
  }

  test("truncateToTokens bounds the token count (X6)") {
    val t = (1 to 500).map(i => s"tok$i").mkString(" ")
    val out = TextKeys.truncateToTokens(t, 50)
    assert(RegexTokenizer.count(out) <= 50)
    assert(t.startsWith(out.take(10)))
    // already-short input unchanged
    assert(TextKeys.truncateToTokens("a b c", 50) == "a b c")
  }

  test("rollingFingerprint is normalization-invariant") {
    val a = TextKeys.rollingFingerprint("Hello,  World!")
    val b = TextKeys.rollingFingerprint("hello world")
    assert(a == b)
    assert(TextKeys.rollingFingerprint("hello there") != a)
  }
}
