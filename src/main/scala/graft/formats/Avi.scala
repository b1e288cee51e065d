package graft.formats

import java.awt.image.BufferedImage

/** RIFF/AVI video container codec (SURVEY §2.9 C2 — the video leg of the
  * multimodal column family; builder brief "frame-sample" op). The
  * reference treats video as opaque bytes handed to external services; a
  * Spark pipeline needs the container-level operations — probe metadata,
  * walk frames, sample every Nth — to run ON the cluster, so the
  * container is implemented here from the public AVI RIFF form (Microsoft
  * Video for Windows / OpenDML AVI file format): little-endian chunks,
  * `hdrl` header list (`avih` main header + per-stream `strl` lists with
  * `strh`/`strf`), `movi` frame data (optionally grouped in `rec ` lists),
  * trailing `idx1` index. The index is deliberately IGNORED on read — the
  * `movi` walk is authoritative, which also handles files whose index is
  * missing or inconsistent.
  *
  * Two frame codecs are supported, both REAL decode paths:
  *  - uncompressed bottom-up 24-bit DIB (`BI_RGB`, the classic raw-AVI
  *    payload): decoded here directly — integer-exact, so oracles can
  *    recompute pixels arithmetically;
  *  - MJPEG (`MJPG` fourcc): each frame is an independent JPEG picture,
  *    decoded through `javax.imageio` (frames written by [[encode]] are
  *    full JFIF streams, so no out-of-band Huffman tables are needed).
  *
  * Like the WAV codec, decode is TOTAL: any malformed payload returns
  * None — a mixed binary column must never fail the task.
  */
object Avi {

  /** A decoded container: geometry, timing (fps = rate/scale), the frame
    * codec fourcc ("DIB " for raw, "MJPG" for motion-JPEG), and each
    * frame's still-encoded payload bytes (frame PIXEL decode is lazy —
    * [[frameImage]] — so metadata probes never touch pixel data).
    */
  final case class AviVideo(width: Int, height: Int, scale: Int, rate: Int,
      codec: String, frames: IndexedSeq[Array[Byte]],
      topDown: Boolean = false,
      // 'auds' stream metadata (first audio stream's WAVEFORMATEX);
      // zeros when the container carries no audio
      audioStreams: Int = 0, audioChannels: Int = 0, audioRate: Int = 0) {
    def nFrames: Int = frames.length
    def durationMs: Long =
      if (rate <= 0) 0L else frames.length.toLong * 1000L * scale / rate
  }

  val CodecDib = "DIB "
  val CodecMjpg = "MJPG"

  /** Decoded-payload ceilings — sizes come from attacker-controlled
    * header bytes (mirrors the image raster cap and the WAV sample cap).
    */
  private val MaxFrames = 65536
  private val MaxFrameBytes = 256L * 1024 * 1024
  private val MaxDim = 16384

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Total AVI decode: None for anything that is not a well-formed AVI
    * with one raw-DIB or MJPEG video stream. Truncated `movi` data yields
    * the complete frames present (lenient tails, as in the WAV path).
    */
  def decode(bytes: Array[Byte]): Option[AviVideo] = {
    if (bytes == null || bytes.length < 24) return None
    if (!(fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ")) return None

    var width = 0
    var height = 0
    var topDown = false
    var scale = 0
    var rate = 0
    var codec: String = null
    var vidStream = -1 // index of the 'vids' strl within hdrl
    var audioStreams = 0
    var audioChannels = 0
    var audioRate = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var frameBytes = 0L

    // one strl: strh tells us if it's the video stream; strf carries the
    // BITMAPINFOHEADER whose biCompression picks the frame codec
    def walkStrl(from: Int, until: Int, streamIdx: Int): Boolean = {
      var off = from
      var isVids = false
      var isAuds = false
      while (off + 8 <= until) {
        val id = fourcc(bytes, off)
        val size = le32(bytes, off + 4)
        if (size < 0) return false
        val body = off + 8
        id match {
          case "strh" if size >= 36 && body + 36 <= bytes.length =>
            // first video stream wins; later vids streams are ignored
            if (fourcc(bytes, body) == "vids" && vidStream < 0) {
              isVids = true
              scale = le32(bytes, body + 20)
              rate = le32(bytes, body + 24)
            } else if (fourcc(bytes, body) == "auds") {
              isAuds = true
              audioStreams += 1
            }
          case "strf" if isAuds && size >= 16 && body + 16 <= bytes.length =>
            // first audio stream's WAVEFORMATEX: wFormatTag(2)
            // nChannels(2) nSamplesPerSec(4)
            if (audioChannels == 0) {
              audioChannels = le16(bytes, body + 2)
              audioRate = le32(bytes, body + 4)
            }
          case "strf" if isVids && size >= 40 && body + 40 <= bytes.length =>
            width = le32(bytes, body + 4)
            // negative biHeight = top-down row order (rows stored first-to-
            // last); the sign must survive to frameImage or top-down files
            // decode vertically flipped
            val rawH = le32(bytes, body + 8)
            height = math.abs(rawH)
            topDown = rawH < 0
            val comp = le32(bytes, body + 16)
            codec =
              if (comp == 0) CodecDib
              else fourcc(bytes, body + 16) match {
                case c @ ("MJPG" | "mjpg") => c.toUpperCase(java.util.Locale.ROOT)
                case _ => return false // unsupported frame codec
              }
            if (isVids) vidStream = streamIdx
          case _ => // JUNK, indx, vprp, … — skipped
        }
        off = body + size + (size & 1) // size 0 still advances 8 (the header)
        if (off <= body && size > 0) return false // overflow guard
      }
      true
    }

    def walkHdrl(from: Int, until: Int): Boolean = {
      var off = from
      var streamIdx = 0
      while (off + 8 <= until) {
        val id = fourcc(bytes, off)
        val size = le32(bytes, off + 4)
        if (size < 0) return false
        val body = off + 8
        if (id == "LIST" && size >= 4 && body + 4 <= bytes.length) {
          if (fourcc(bytes, body) == "strl") {
            if (!walkStrl(body + 4, math.min(body + size, bytes.length), streamIdx)) return false
            streamIdx += 1
          }
        } else if (id == "avih" && size >= 40 && body + 40 <= bytes.length) {
          if (width == 0) width = le32(bytes, body + 32)
          if (height == 0) height = le32(bytes, body + 36)
        }
        off = body + size + (size & 1) // size 0 still advances 8 (the header)
        if (off <= body && size > 0) return false // overflow guard
      }
      true
    }

    // frame chunks for the video stream: '##db' (raw) / '##dc' (compressed)
    def walkMovi(from: Int, until: Int): Boolean = {
      var off = from
      while (off + 8 <= until) {
        val id = fourcc(bytes, off)
        val size = le32(bytes, off + 4)
        if (size < 0) return false
        val body = off + 8
        if (id == "LIST" && size >= 4 && body + 4 <= bytes.length &&
            fourcc(bytes, body) == "rec ") {
          if (!walkMovi(body + 4, math.min(body + size, bytes.length))) return false
        } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.substring(2) == "db" || id.substring(2) == "dc")) {
          val stream = (id(0) - '0') * 10 + (id(1) - '0')
          if (stream == vidStream) {
            val len = math.min(size, bytes.length - body) // lenient tail
            // zero-size frame chunks are dropped-frame placeholders — skip
            if (len > 0) {
              frameBytes += len
              if (frames.length >= MaxFrames || frameBytes > MaxFrameBytes) return false
              frames += java.util.Arrays.copyOfRange(bytes, body, body + len)
            }
          }
        }
        off = body + size + (size & 1) // size 0 still advances 8 (the header)
        if (off <= body && size > 0) return false // overflow guard
      }
      true
    }

    // top level: hdrl must precede movi (vidStream known before frames)
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = fourcc(bytes, off)
      val size = le32(bytes, off + 4)
      if (size < 0) return None
      val body = off + 8
      if (id == "LIST" && size >= 4 && body + 4 <= bytes.length) {
        val lt = fourcc(bytes, body)
        val end = math.min(body + size, bytes.length)
        if (lt == "hdrl") { if (!walkHdrl(body + 4, end)) return None }
        else if (lt == "movi") {
          if (vidStream < 0) return None
          if (!walkMovi(body + 4, end)) return None
        }
      }
      off = body + size + (size & 1) // size 0 still advances 8 (the header)
      if (off <= body && size > 0) return None // overflow guard
    }

    if (vidStream < 0 || codec == null) return None
    if (width < 1 || width > MaxDim || height < 1 || height > MaxDim) return None
    if (scale < 1 || rate < 1) return None
    Some(AviVideo(width, height, scale, rate, codec, frames.toIndexedSeq,
      topDown, audioStreams, audioChannels, audioRate))
  }

  /** Decode one frame's pixels. Raw DIB frames decode here (bottom-up
    * BGR rows, 4-byte-aligned stride — the BI_RGB layout); MJPEG frames
    * go through `javax.imageio`. None for malformed frame payloads.
    */
  def frameImage(v: AviVideo, i: Int): Option[BufferedImage] = {
    if (i < 0 || i >= v.frames.length) return None
    val f = v.frames(i)
    v.codec match {
      case CodecDib =>
        val stride = ((v.width * 3 + 3) / 4) * 4
        if (f.length < stride * v.height) return None
        val img = new BufferedImage(v.width, v.height, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < v.height) {
          val row = (if (v.topDown) y else v.height - 1 - y) * stride
          var x = 0
          while (x < v.width) {
            val o = row + x * 3
            val rgb = ((f(o + 2) & 0xff) << 16) | ((f(o + 1) & 0xff) << 8) | (f(o) & 0xff)
            img.setRGB(x, y, rgb)
            x += 1
          }
          y += 1
        }
        Some(img)
      case CodecMjpg =>
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f)))
        catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }
  }

  /** Encode a container: `hdrl` (avih + one vids strl), `movi` with one
    * chunk per frame (`00db` raw / `00dc` MJPEG), and a standard `idx1`
    * (offsets relative to the `movi` list fourcc, AVIIF_KEYFRAME on every
    * frame — both codecs here are intra-only).
    */
  def encode(v: AviVideo): Array[Byte] = {
    require(v.width >= 1 && v.height >= 1, s"bad dims ${v.width}x${v.height}")
    require(v.scale >= 1 && v.rate >= 1, s"bad timing ${v.rate}/${v.scale}")
    require(v.codec == CodecDib || v.codec == CodecMjpg, s"bad codec ${v.codec}")
    val frameId = if (v.codec == CodecDib) "00db" else "00dc"

    val out = new java.io.ByteArrayOutputStream()
    def put8(x: Int): Unit = out.write(x & 0xff)
    def put16(x: Int): Unit = { put8(x); put8(x >> 8) }
    def put32(x: Int): Unit = { put16(x); put16(x >> 16) }
    def putFcc(s: String): Unit = { require(s.length == 4); s.foreach(c => put8(c.toInt)) }

    val maxFrame = if (v.frames.isEmpty) 0 else v.frames.map(_.length).max
    val paddedFrames = v.frames.map(f => f.length + (f.length & 1))
    val moviSize = 4 + paddedFrames.map(_ + 8).sum
    val idx1Size = v.frames.length * 16
    val strfSize = 40
    val strlSize = 4 + (8 + 56) + (8 + strfSize)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)

    putFcc("RIFF"); put32(riffSize); putFcc("AVI ")

    putFcc("LIST"); put32(hdrlSize); putFcc("hdrl")
    putFcc("avih"); put32(56)
    val usPerFrame = (1000000L * v.scale / v.rate).toInt
    put32(usPerFrame)                    // dwMicroSecPerFrame
    put32(0)                             // dwMaxBytesPerSec
    put32(0)                             // dwPaddingGranularity
    put32(0x10)                          // dwFlags: AVIF_HASINDEX
    put32(v.frames.length)               // dwTotalFrames
    put32(0)                             // dwInitialFrames
    put32(1)                             // dwStreams
    put32(maxFrame)                      // dwSuggestedBufferSize
    put32(v.width); put32(v.height)
    (0 until 4).foreach(_ => put32(0))   // reserved

    putFcc("LIST"); put32(strlSize); putFcc("strl")
    putFcc("strh"); put32(56)
    putFcc("vids")
    putFcc(if (v.codec == CodecDib) "DIB " else "MJPG") // fccHandler
    put32(0); put16(0); put16(0)         // flags, priority, language
    put32(0)                             // initial frames
    put32(v.scale); put32(v.rate)
    put32(0)                             // start
    put32(v.frames.length)               // length (in frames)
    put32(maxFrame)                      // suggested buffer
    put32(-1)                            // quality (default)
    put32(0)                             // sample size (0 = varying)
    put16(0); put16(0); put16(v.width); put16(v.height) // rcFrame

    putFcc("strf"); put32(strfSize)
    put32(40)                            // biSize
    put32(v.width); put32(v.height)      // positive height = bottom-up
    put16(1)                             // biPlanes
    put16(24)                            // biBitCount
    if (v.codec == CodecDib) put32(0) else putFcc("MJPG") // biCompression
    put32(((v.width * 3 + 3) / 4) * 4 * v.height) // biSizeImage
    put32(0); put32(0); put32(0); put32(0)

    putFcc("LIST"); put32(moviSize); putFcc("movi")
    // idx1 offsets point at each chunk header, counted from the 'movi'
    // fourcc itself (the Video-for-Windows convention)
    val offsets = new Array[Int](v.frames.length)
    var rel = 4
    var i = 0
    while (i < v.frames.length) {
      offsets(i) = rel
      val f = v.frames(i)
      putFcc(frameId); put32(f.length)
      out.write(f)
      if ((f.length & 1) == 1) put8(0)   // word-align
      rel += 8 + f.length + (f.length & 1)
      i += 1
    }

    putFcc("idx1"); put32(idx1Size)
    i = 0
    while (i < v.frames.length) {
      putFcc(frameId)
      put32(0x10)                        // AVIIF_KEYFRAME
      put32(offsets(i))
      put32(v.frames(i).length)
      i += 1
    }
    out.toByteArray
  }

  /** Pack a 24-bit image into the raw bottom-up BGR DIB frame layout. */
  def encodeDibFrame(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val stride = ((w * 3 + 3) / 4) * 4
    val f = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val o = row + x * 3
        f(o) = (rgb & 0xff).toByte
        f(o + 1) = ((rgb >> 8) & 0xff).toByte
        f(o + 2) = ((rgb >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    f
  }
}
