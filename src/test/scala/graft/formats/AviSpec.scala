package graft.formats

import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage

/** RIFF/AVI container codec: encode→decode round-trips for both frame
  * codecs, pixel-exact DIB decode, MJPEG through ImageIO, `rec ` list
  * grouping, stream selection, and hostile-input totality.
  */
class AviSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, f: Int): BufferedImage = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, graft.pipeline.Video.synthRgb(5L, f, x, y))
    im
  }

  private def dibVideo(w: Int, h: Int, n: Int, rate: Int = 30, scale: Int = 1) =
    Avi.AviVideo(w, h, scale, rate, Avi.CodecDib,
      IndexedSeq.tabulate(n)(f => Avi.encodeDibFrame(img(w, h, f))))

  test("DIB round-trip: header fields and every pixel of every frame") {
    val v = dibVideo(13, 7, 5) // odd width exercises the 4-byte row stride
    val d = Avi.decode(Avi.encode(v)).get
    assert(d.width == 13 && d.height == 7 && d.nFrames == 5)
    assert(d.rate == 30 && d.scale == 1 && d.codec == Avi.CodecDib)
    assert(d.durationMs == 5 * 1000L / 30)
    for (f <- 0 until 5) {
      val got = Avi.frameImage(d, f).get
      val want = img(13, 7, f)
      for (y <- 0 until 7; x <- 0 until 13)
        assert((got.getRGB(x, y) & 0xffffff) == (want.getRGB(x, y) & 0xffffff),
          s"frame $f pixel ($x,$y)")
    }
  }

  test("top-down DIB (negative biHeight) decodes unflipped") {
    val w = 9; val h = 6
    // pack frames with rows stored FIRST-to-last (top-down layout)
    val stride = ((w * 3 + 3) / 4) * 4
    val frames = IndexedSeq.tabulate(2) { f =>
      val im = img(w, h, f)
      val bytes = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = im.getRGB(x, y)
        val o = y * stride + x * 3 // y*stride, not (h-1-y)*stride
        bytes(o) = (rgb & 0xff).toByte
        bytes(o + 1) = ((rgb >> 8) & 0xff).toByte
        bytes(o + 2) = ((rgb >> 16) & 0xff).toByte
      }
      bytes
    }
    val enc = Avi.encode(Avi.AviVideo(w, h, 1, 25, Avi.CodecDib, frames))
    // patch strf's biHeight (at strf body + 8) to -h — the top-down flag
    val strf = {
      var i = 0
      while (!(enc(i) == 's' && enc(i + 1) == 't' && enc(i + 2) == 'r' && enc(i + 3) == 'f')) i += 1
      i
    }
    val hOff = strf + 8 + 8
    val neg = -h
    enc(hOff) = (neg & 0xff).toByte
    enc(hOff + 1) = ((neg >> 8) & 0xff).toByte
    enc(hOff + 2) = ((neg >> 16) & 0xff).toByte
    enc(hOff + 3) = ((neg >> 24) & 0xff).toByte
    val d = Avi.decode(enc).get
    assert(d.height == h && d.topDown)
    for (f <- 0 until 2) {
      val got = Avi.frameImage(d, f).get
      val want = img(w, h, f)
      for (y <- 0 until h; x <- 0 until w)
        assert((got.getRGB(x, y) & 0xffffff) == (want.getRGB(x, y) & 0xffffff),
          s"frame $f pixel ($x,$y) flipped or wrong")
    }
  }

  test("MJPEG round-trip: frames decode through ImageIO with bounded error") {
    val w = 32; val h = 24
    val frames = IndexedSeq.tabulate(3) { f =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img(w, h, f), "jpg", bos)
      bos.toByteArray
    }
    val d = Avi.decode(Avi.encode(Avi.AviVideo(w, h, 1, 25, Avi.CodecMjpg, frames))).get
    assert(d.codec == Avi.CodecMjpg && d.nFrames == 3)
    for (f <- 0 until 3) {
      val got = Avi.frameImage(d, f).get
      assert(got.getWidth == w && got.getHeight == h)
      // JPEG is lossy but bounded: mean abs channel error under ~16
      var err = 0L
      val want = img(w, h, f)
      for (y <- 0 until h; x <- 0 until w) {
        val a = got.getRGB(x, y); val b = want.getRGB(x, y)
        err += math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)) +
          math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)) +
          math.abs((a & 0xff) - (b & 0xff))
      }
      // the synth pattern is near-white-noise — JPEG's worst case; the
      // bound only pins "decoded the right picture", not codec quality
      assert(err / (w * h * 3) < 32, s"frame $f mean err ${err / (w * h * 3)}")
    }
  }

  test("decoder walks frames inside rec-grouped movi lists") {
    val v = dibVideo(8, 8, 3)
    val plain = Avi.encode(v)
    // rebuild the movi list with the frames wrapped in a 'rec ' LIST
    val d0 = Avi.decode(plain).get
    val frameChunks = d0.frames.map { f =>
      val b = new java.io.ByteArrayOutputStream()
      b.write("00db".getBytes("US-ASCII"))
      b.write(Array[Byte]((f.length & 0xff).toByte, ((f.length >> 8) & 0xff).toByte,
        ((f.length >> 16) & 0xff).toByte, ((f.length >> 24) & 0xff).toByte))
      b.write(f)
      if ((f.length & 1) == 1) b.write(0)
      b.toByteArray
    }
    val recBody = "rec ".getBytes("US-ASCII") ++ frameChunks.flatten
    val rec = "LIST".getBytes("US-ASCII") ++ Array[Byte](
      (recBody.length & 0xff).toByte, ((recBody.length >> 8) & 0xff).toByte,
      ((recBody.length >> 16) & 0xff).toByte, ((recBody.length >> 24) & 0xff).toByte) ++ recBody
    // splice: find the original movi list and replace its body with the rec
    val idx = {
      var i = -1
      var o = 12
      while (i < 0 && o + 12 <= plain.length) {
        if (new String(plain, o, 4, "US-ASCII") == "LIST" &&
            new String(plain, o + 8, 4, "US-ASCII") == "movi") i = o
        else o += 1
      }
      i
    }
    assert(idx > 0)
    val moviSize = (plain(idx + 4) & 0xff) | ((plain(idx + 5) & 0xff) << 8) |
      ((plain(idx + 6) & 0xff) << 16) | ((plain(idx + 7) & 0xff) << 24)
    val newMoviBody = "movi".getBytes("US-ASCII") ++ rec
    val out = new java.io.ByteArrayOutputStream()
    out.write(plain, 0, idx)
    out.write("LIST".getBytes("US-ASCII"))
    out.write(Array[Byte]((newMoviBody.length & 0xff).toByte,
      ((newMoviBody.length >> 8) & 0xff).toByte,
      ((newMoviBody.length >> 16) & 0xff).toByte,
      ((newMoviBody.length >> 24) & 0xff).toByte))
    out.write(newMoviBody)
    out.write(plain, idx + 8 + moviSize, plain.length - (idx + 8 + moviSize))
    val d = Avi.decode(out.toByteArray).get
    assert(d.nFrames == 3)
    assert(d.frames.zip(d0.frames).forall { case (a, b) => a.sameElements(b) })
  }

  test("only the video stream's chunks are collected") {
    // hand-build: audio strl FIRST (stream 0), video strl second (stream 1)
    // → frames must come from '01db', and '00wb' audio chunks are ignored
    val v = dibVideo(4, 4, 2)
    val vidFrames = v.frames
    val strhAud = new Array[Byte](56)
    "auds".getBytes("US-ASCII").copyToArray(strhAud, 0)
    val strhVid = new Array[Byte](56)
    "vids".getBytes("US-ASCII").copyToArray(strhVid, 0)
    strhVid(20) = 1 // scale = 1
    strhVid(24) = 25 // rate = 25
    val strfVid = new Array[Byte](40)
    strfVid(0) = 40
    strfVid(4) = 4 // width
    strfVid(8) = 4 // height
    strfVid(12) = 1; strfVid(14) = 24 // planes, bpp (biCompression stays 0)
    // assemble nested lists bottom-up with byte arrays
    def mkChunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes("US-ASCII"));
      b.write(Array[Byte]((body.length & 0xff).toByte, ((body.length >> 8) & 0xff).toByte,
        ((body.length >> 16) & 0xff).toByte, ((body.length >> 24) & 0xff).toByte))
      b.write(body)
      if ((body.length & 1) == 1) b.write(0)
      b.toByteArray
    }
    def mkList(tpe: String, parts: Array[Byte]*): Array[Byte] =
      mkChunk("LIST", tpe.getBytes("US-ASCII") ++ parts.flatten)
    val avih = new Array[Byte](56)
    avih(24 + 0) = 2 // two streams
    avih(32) = 4; avih(36) = 4
    val hdrl = mkList("hdrl", mkChunk("avih", avih),
      mkList("strl", mkChunk("strh", strhAud)),
      mkList("strl", mkChunk("strh", strhVid), mkChunk("strf", strfVid)))
    val movi = mkList("movi",
      mkChunk("00wb", Array.fill[Byte](10)(1)), // audio — must be ignored
      mkChunk("01db", vidFrames(0)),
      mkChunk("00wb", Array.fill[Byte](10)(2)),
      mkChunk("01db", vidFrames(1)))
    val riffBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val bytes = mkChunk("RIFF", riffBody)
    val d = Avi.decode(bytes).get
    assert(d.nFrames == 2 && d.width == 4 && d.height == 4)
    assert(d.frames(0).sameElements(vidFrames(0)))
    assert(d.frames(1).sameElements(vidFrames(1)))
    // the 'auds' stream is counted (its fixture strl carries no strf, so
    // channel/rate metadata stays zero)
    assert(d.audioStreams == 1 && d.audioChannels == 0 && d.audioRate == 0)
  }

  test("audio stream WAVEFORMATEX metadata is captured") {
    val v = dibVideo(4, 4, 1)
    def mkChunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes("US-ASCII"))
      b.write(Array[Byte]((body.length & 0xff).toByte, ((body.length >> 8) & 0xff).toByte,
        ((body.length >> 16) & 0xff).toByte, ((body.length >> 24) & 0xff).toByte))
      b.write(body)
      if ((body.length & 1) == 1) b.write(0)
      b.toByteArray
    }
    def mkList(tpe: String, parts: Array[Byte]*): Array[Byte] =
      mkChunk("LIST", tpe.getBytes("US-ASCII") ++ parts.flatten)
    val strhVid = new Array[Byte](56)
    "vids".getBytes("US-ASCII").copyToArray(strhVid, 0)
    strhVid(20) = 1; strhVid(24) = 25
    val strfVid = new Array[Byte](40)
    strfVid(0) = 40; strfVid(4) = 4; strfVid(8) = 4
    strfVid(12) = 1; strfVid(14) = 24
    val strhAud = new Array[Byte](56)
    "auds".getBytes("US-ASCII").copyToArray(strhAud, 0)
    val strfAud = new Array[Byte](16) // WAVEFORMATEX prefix
    strfAud(0) = 1                    // wFormatTag = PCM
    strfAud(2) = 2                    // nChannels = 2
    strfAud(4) = 0x40.toByte; strfAud(5) = 0x1f // 8000 Hz (0x1f40)
    val avih = new Array[Byte](56)
    avih(24) = 2; avih(32) = 4; avih(36) = 4
    val hdrl = mkList("hdrl", mkChunk("avih", avih),
      mkList("strl", mkChunk("strh", strhVid), mkChunk("strf", strfVid)),
      mkList("strl", mkChunk("strh", strhAud), mkChunk("strf", strfAud)))
    val movi = mkList("movi", mkChunk("00db", v.frames(0)))
    val bytes = mkChunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
    val d = Avi.decode(bytes).get
    assert(d.nFrames == 1)
    assert(d.audioStreams == 1 && d.audioChannels == 2 && d.audioRate == 8000)
  }

  test("hostile inputs decode to None, never throw") {
    val good = Avi.encode(dibVideo(6, 6, 2))
    val cases: Seq[Array[Byte]] = Seq(
      null,
      Array.empty[Byte],
      Array.fill[Byte](64)(0x41),
      "RIFF\u0000\u0000\u0000\u0000WAVE".getBytes("US-ASCII"), // wrong form
      good.take(20),                       // truncated header
      good.updated(40, 0xff.toByte),       // corrupted header field
      { val b = good.clone(); b(4) = -1; b(5) = -1; b(6) = -1; b(7) = -1; b }, // negative size
      graft.pipeline.Multimodal.synthPng(8, 8, 1) // a PNG, not an AVI
    )
    cases.foreach(c => Avi.decode(c)) // totality: no case may throw
    // and specifically: the clearly-invalid ones are None
    assert(Avi.decode(null).isEmpty)
    assert(Avi.decode(Array.fill[Byte](64)(0x41)).isEmpty)
    assert(Avi.decode(good.take(20)).isEmpty)
  }

  test("truncated movi decodes the complete frames present") {
    val v = dibVideo(6, 6, 4)
    val full = Avi.encode(v)
    // cut in the middle of the last frame's chunk (before idx1)
    val frameLen = v.frames(0).length
    val cut = full.length - (16 * 4 + 8) - frameLen / 2 // inside frame 3
    val d = Avi.decode(full.take(cut))
    assert(d.nonEmpty)
    assert(d.get.nFrames >= 3) // at least the three complete frames
    assert(Avi.frameImage(d.get, 2).nonEmpty)
  }
}
