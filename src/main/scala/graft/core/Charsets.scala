package graft.core

import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction, StandardCharsets}

/** X7: local charset detection + decode (SURVEY §2.8).
  *
  * The reference detects the encoding of every blob before decoding
  * (chardet in /root/reference/chunking/chunkers/base_chunker.py:295-306,
  * `decode_to_utf8`). This is the dependency-free equivalent, covering the
  * encodings that actually occur in document corpora:
  *
  *   1. BOM sniffing (UTF-8, UTF-16 LE/BE) — authoritative when present;
  *   2. strict UTF-8 validation — UTF-8 is self-synchronizing, so a payload
  *      that fully validates IS UTF-8 for any practical purpose;
  *   3. a NUL-distribution heuristic for BOM-less UTF-16 (Latin-script
  *      UTF-16 text has ~half its bytes zero, on one parity);
  *   4. windows-1252 fallback (the Latin-1 superset chardet also lands on
  *      for Western single-byte text — every byte sequence decodes).
  *
  * Detection is pure and total: any byte array yields a charset and a
  * replacement-free decode under that charset's rules, mirroring the
  * reference's `errors='replace'` contract.
  */
object Charsets {

  final case class Detected(charset: String, bomBytes: Int)

  private val Win1252 = Charset.forName("windows-1252")

  /** Strict validation: does the payload decode under `cs` without error? */
  private def validates(bytes: Array[Byte], offset: Int, cs: Charset): Boolean = {
    val dec: CharsetDecoder = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(bytes, offset, bytes.length - offset)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  /** Detect the charset of a byte payload. Never throws; empty → UTF-8. */
  def detect(bytes: Array[Byte]): Detected = {
    if (bytes == null || bytes.isEmpty) return Detected("UTF-8", 0)
    val n = bytes.length
    def b(i: Int): Int = bytes(i) & 0xff
    if (n >= 3 && b(0) == 0xEF && b(1) == 0xBB && b(2) == 0xBF)
      return Detected("UTF-8", 3)
    if (n >= 2 && b(0) == 0xFF && b(1) == 0xFE)
      return Detected("UTF-16LE", 2)
    if (n >= 2 && b(0) == 0xFE && b(1) == 0xFF)
      return Detected("UTF-16BE", 2)
    // BOM-less UTF-16 must be ruled out BEFORE the UTF-8 claim: a NUL byte
    // is valid UTF-8, so ASCII-range UTF-16 text ("h\0i\0…") would pass
    // strict UTF-8 validation. Latin-script UTF-16 puts a NUL in every
    // other byte, on one parity; real single-byte text contains none.
    val scan = math.min(n & ~1, 512)
    var zeroEven = 0; var zeroOdd = 0
    var i = 0
    while (i < scan) {
      if (b(i) == 0) { if (i % 2 == 0) zeroEven += 1 else zeroOdd += 1 }
      i += 1
    }
    if (scan >= 8) {
      val half = scan / 2
      if (zeroOdd * 10 >= half * 3 && zeroEven == 0 &&
          validates(bytes, 0, StandardCharsets.UTF_16LE))
        return Detected("UTF-16LE", 0)
      if (zeroEven * 10 >= half * 3 && zeroOdd == 0 &&
          validates(bytes, 0, StandardCharsets.UTF_16BE))
        return Detected("UTF-16BE", 0)
    }
    // text never legitimately contains NULs — a payload with any is binary
    // or an undetected multibyte encoding, not UTF-8
    if (zeroEven + zeroOdd == 0 && validates(bytes, 0, StandardCharsets.UTF_8))
      return Detected("UTF-8", 0)
    Detected("windows-1252", 0)
  }

  /** Detect + decode. Replacement-on-error, BOM stripped — the same
    * observable contract as the reference's `decode(encoding, 'replace')`.
    */
  def decodeDetected(bytes: Array[Byte]): (String, String) = {
    if (bytes == null) return (null, "UTF-8")
    val d = detect(bytes)
    val cs = d.charset match {
      case "windows-1252" => Win1252
      case other => Charset.forName(other)
    }
    // String(bytes, cs) replaces malformed input — matching errors='replace'
    (new String(bytes, d.bomBytes, bytes.length - d.bomBytes, cs), d.charset)
  }
}
