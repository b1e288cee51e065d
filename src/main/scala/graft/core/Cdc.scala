package graft.core

/** Content-defined chunking: boundaries fall where a rolling hash of the
  * last `window` characters masks to zero (the LBFS construction,
  * Muthitacharoen et al. 2001, SOSP — the same idea behind restic/borg
  * dedup and chunk-stable storage). Because a boundary depends only on the
  * `window` characters before it, an edit reshapes at most the chunks it
  * touches plus one — fixed-size chunking shifts EVERY boundary after the
  * edit, which is what makes CDC the dedup-friendly chunker: unchanged
  * document regions keep byte-identical chunks (and therefore identical
  * fingerprints) across versions.
  *
  * Deterministic pure function: polynomial rolling hash in Long arithmetic
  * (wraparound is mod 2^64, identical on every JVM), no allocation beyond
  * the ring buffer and output.
  */
object Cdc {

  /** Split `text` into content-defined chunks.
    *
    * @param maskBits boundary probability 2^-maskBits → expected chunk
    *                 length ≈ minLen + 2^maskBits
    * @param minLen   boundaries inside the first minLen chars of a chunk
    *                 are ignored (guards against tiny chunks)
    * @param maxLen   force a split at maxLen (guards against unbounded
    *                 chunks on low-entropy text)
    */
  def chunks(text: String, window: Int = 16, maskBits: Int = 6,
      minLen: Int = 32, maxLen: Int = 512): Vector[String] = {
    require(window > 0 && maskBits > 0 && minLen >= window && maxLen > minLen,
      s"bad CDC params: window=$window maskBits=$maskBits min=$minLen max=$maxLen")
    if (text.isEmpty) return Vector.empty
    val mask = (1L << maskBits) - 1L
    val B = 257L
    // B^(window-1) for removing the outgoing character
    var bw = 1L
    var i = 0
    while (i < window - 1) { bw *= B; i += 1 }
    val ring = new Array[Long](window)
    val out = Vector.newBuilder[String]
    var start = 0
    var h = 0L
    i = 0
    while (i < text.length) {
      val c = text.charAt(i).toLong
      val pos = i % window
      if (i >= window) h -= ring(pos) * bw
      h = h * B + c
      ring(pos) = c
      val chunkLen = i - start + 1
      val atBoundary = i >= window - 1 && (h & mask) == 0L && chunkLen >= minLen
      if (atBoundary || chunkLen == maxLen) {
        out += text.substring(start, i + 1)
        start = i + 1
      }
      i += 1
    }
    if (start < text.length) out += text.substring(start)
    out.result()
  }
}
