package graft.formats

/** RIFF/WAVE PCM codec (SURVEY §2.9 C2 — audio leg of the multimodal
  * column family). The reference hands audio bytes to a transcription
  * service whole (transcription_chunker.py feeds the blob and consumes
  * WebVTT back); a Spark pipeline additionally needs the container-level
  * operations — decode, feature-extract, window, clip by cue — to run ON
  * the cluster, so the codec itself is implemented here from the public
  * RIFF/WAVE format (multimedia programming interface spec, IBM/Microsoft
  * 1991): little-endian chunks, `fmt ` (PCM or EXTENSIBLE-wrapping-PCM),
  * `data` with word-aligned chunk padding. Unlike video (the JDK ships no
  * codec) this is a REAL decode path — `WavSpec` cross-validates every
  * encode/decode against `javax.sound.sampled`, the JDK's own WAV codec.
  *
  * Samples are signed Ints per channel (8-bit WAV stores unsigned bytes;
  * the offset is mapped here so callers always see signed PCM).
  */
object Wav {

  final case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Array[Int]]) {
    def nFrames: Int = if (samples.isEmpty) 0 else samples(0).length
    def durationMs: Long = if (sampleRate <= 0) 0L else nFrames * 1000L / sampleRate
  }

  /** Decoded-size ceiling, mirroring the image path's raster cap: chunk
    * sizes come from attacker-controlled header bytes and the sample
    * buffers are allocated eagerly.
    */
  private val MaxDecodeSamples = 64L * 1024 * 1024

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Total WAV decode: None for anything that is not a well-formed PCM
    * RIFF/WAVE payload (wrong magic, no fmt/data, compressed formats,
    * out-of-range geometry). A truncated data chunk decodes its complete
    * frames — codecs are lenient about tails, and a mixed binary column
    * must never fail the task.
    */
  def decode(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var off = 12
    var fmtOk = false
    var audioFormat = 0
    var channels = 0
    var rate = 0
    var bits = 0
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= bytes.length && (dataOff < 0 || !fmtOk)) {
      val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(bytes, off + 4)
      if (size < 0) return None
      val body = off + 8
      id match {
        case "fmt " if size >= 16 && body + 16 <= bytes.length =>
          audioFormat = le16(bytes, body)
          channels = le16(bytes, body + 2)
          rate = le32(bytes, body + 4)
          bits = le16(bytes, body + 14)
          // WAVE_FORMAT_EXTENSIBLE wraps the real format in the first two
          // bytes of the 16-byte SubFormat GUID at offset 24 of the chunk
          if (audioFormat == 0xfffe && size >= 40 && body + 26 <= bytes.length)
            audioFormat = le16(bytes, body + 24)
          fmtOk = true
        case "data" =>
          dataOff = body
          dataLen = math.min(size, bytes.length - body) // lenient tail
        case _ => // LIST, fact, cue, bext, … — skipped
      }
      off = body + size + (size & 1) // chunks are word-aligned
      if (off <= body) return None   // overflow guard
    }
    if (!fmtOk || dataOff < 0) return None
    if (audioFormat != 1) return None // PCM only (3 = float unsupported)
    if (channels < 1 || channels > 8) return None
    if (rate < 1 || rate > 384000) return None
    if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return None
    val bytesPerFrame = channels * (bits / 8)
    val frames = dataLen / bytesPerFrame
    if (frames.toLong * channels > MaxDecodeSamples) return None
    val out = Array.fill(channels)(new Array[Int](frames))
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        val o = dataOff + (f * channels + c) * (bits / 8)
        out(c)(f) = bits match {
          case 8  => (bytes(o) & 0xff) - 128 // stored unsigned, offset-binary
          case 16 => le16(bytes, o).toShort.toInt
          case 24 =>
            val v = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) | ((bytes(o + 2) & 0xff) << 16)
            (v << 8) >> 8 // sign-extend 24-bit
          case _  => le32(bytes, o)
        }
        c += 1
      }
      f += 1
    }
    Some(WavAudio(rate, channels, bits, out))
  }

  /** Canonical 44-byte-header PCM encode (8/16-bit). */
  def encode(a: WavAudio): Array[Byte] = {
    require(a.bitsPerSample == 8 || a.bitsPerSample == 16,
      s"encode supports 8/16-bit PCM, got ${a.bitsPerSample}")
    require(a.channels >= 1 && a.samples.length == a.channels,
      s"channel count ${a.channels} != sample planes ${a.samples.length}")
    require(a.samples.forall(_.length == a.nFrames), "ragged channel planes")
    val bytesPerFrame = a.channels * (a.bitsPerSample / 8)
    val dataLen = a.nFrames * bytesPerFrame
    // RIFF chunks are word-aligned: an odd-sized data chunk (8-bit mono,
    // odd frame count) carries one zero pad byte. The pad is NOT part of
    // the data chunk size but IS part of the RIFF size.
    val pad = dataLen & 1
    val b = new Array[Byte](44 + dataLen + pad)
    def putAscii(o: Int, s: String): Unit = { var i = 0; while (i < s.length) { b(o + i) = s.charAt(i).toByte; i += 1 } }
    def put16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte; b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte }
    putAscii(0, "RIFF"); put32(4, 36 + dataLen + pad); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, a.channels)
    put32(24, a.sampleRate); put32(28, a.sampleRate * bytesPerFrame)
    put16(32, bytesPerFrame); put16(34, a.bitsPerSample)
    putAscii(36, "data"); put32(40, dataLen)
    var f = 0
    while (f < a.nFrames) {
      var c = 0
      while (c < a.channels) {
        val s = a.samples(c)(f)
        val o = 44 + (f * a.channels + c) * (a.bitsPerSample / 8)
        if (a.bitsPerSample == 8) b(o) = (((s max -128) min 127) + 128).toByte
        else { val v = (s max -32768) min 32767; b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
        c += 1
      }
      f += 1
    }
    b
  }

  /** Clip by time range — the per-cue audio-segment cut the reference's
    * transcription flow implies (cue timestamps come from WebVTT). Frame
    * range is [startMs·rate/1000, endMs·rate/1000) clamped to the payload.
    */
  def slice(a: WavAudio, startMs: Long, endMs: Long): WavAudio = {
    val from = ((startMs * a.sampleRate / 1000) max 0L).toInt min a.nFrames
    val until = ((endMs * a.sampleRate / 1000) max 0L).toInt min a.nFrames
    val hi = until max from
    WavAudio(a.sampleRate, a.channels, a.bitsPerSample,
      a.samples.map(_.slice(from, hi)))
  }

  /** Keep every k-th frame (integer decimation; nominal rate divides by k). */
  def decimate(a: WavAudio, k: Int): WavAudio = {
    require(k >= 1, s"decimation factor must be >= 1, got $k")
    WavAudio(a.sampleRate / k max 1, a.channels, a.bitsPerSample,
      a.samples.map { ch =>
        val out = new Array[Int]((ch.length + k - 1) / k)
        var i = 0
        while (i < out.length) { out(i) = ch(i * k); i += 1 }
        out
      })
  }

  /** Fixed-point linear resample to a new rate. Output position i maps to
    * source position i·srcRate/dstRate; the fractional part interpolates
    * between neighbours in exact integer arithmetic (floorDiv), so results
    * are bit-identical across JVMs.
    */
  def resampleLinear(a: WavAudio, newRate: Int): WavAudio = {
    require(newRate >= 1 && newRate <= 384000, s"bad target rate $newRate")
    if (newRate == a.sampleRate || a.nFrames == 0)
      return a.copy(sampleRate = newRate)
    val outFrames = math.max(1L, a.nFrames.toLong * newRate / a.sampleRate).toInt
    WavAudio(newRate, a.channels, a.bitsPerSample,
      a.samples.map { ch =>
        val out = new Array[Int](outFrames)
        var i = 0
        while (i < outFrames) {
          val num = i.toLong * a.sampleRate
          val pos = (num / newRate).toInt
          val frac = num % newRate
          val s0 = ch(pos min (ch.length - 1))
          val s1 = ch((pos + 1) min (ch.length - 1))
          out(i) = s0 + Math.floorDiv((s1 - s0) * frac, newRate.toLong).toInt
          i += 1
        }
        out
      })
  }
}
