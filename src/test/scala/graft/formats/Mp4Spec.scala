package graft.formats

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF walker: encode→decode round-trip, exact sample-extent
  * resolution through stsc/stco/stsz (multi-chunk, mid-chunk, short last
  * chunk), stss keyframes, and hostile-input totality.
  */
class Mp4Spec extends AnyFunSuite {

  private def samples(seed: Long, n: Int): IndexedSeq[Array[Byte]] =
    IndexedSeq.tabulate(n) { f =>
      val len = (100 + (seed + f) % 50).toInt
      Array.tabulate[Byte](len)(i => graft.pipeline.Video.synthMp4Byte(seed, f, i).toByte)
    }

  test("round-trip: header fields, track geometry, sample tables") {
    val ss = samples(3L, 8) // 3-per-chunk → chunks of 3,3,2 (short tail run)
    val bytes = Mp4.encode(ss, 320, 240, timescale = 1000, sampleDelta = 40)
    val v = Mp4.decode(bytes).get
    assert(v.brand == "isom")
    assert(v.timescale == 1000 && v.duration == 8 * 40)
    assert(v.durationMs == 320)
    val t = v.videoTracks.head
    assert(t.id == 1 && t.handler == "vide" && t.codec == "mp4v")
    assert(t.width == 320 && t.height == 240)
    assert(t.nSamples == 8)
    assert(t.sampleSizes == ss.map(_.length.toLong))
    assert(t.chunkOffsets.length == 3)
    assert(t.syncSamples == IndexedSeq(1L, 3L, 5L, 7L)) // every 2nd, 1-based
  }

  test("sampleBytes resolves every sample byte-exactly") {
    for (n <- Seq(1, 3, 7, 9)) { // uniform-run and short-tail stsc shapes
      val ss = samples(11L, n)
      val bytes = Mp4.encode(ss, 64, 48, 1000, 40)
      val t = Mp4.decode(bytes).get.videoTracks.head
      for (i <- 0 until n) {
        val got = Mp4.sampleBytes(bytes, t, i)
        assert(got.nonEmpty, s"n=$n sample $i unresolved")
        assert(got.get.sameElements(ss(i)), s"n=$n sample $i bytes differ")
      }
      assert(Mp4.sampleBytes(bytes, t, n).isEmpty)
      assert(Mp4.sampleBytes(bytes, t, -1).isEmpty)
    }
  }

  test("uniform stsz and co64 resolve through sampleExtent") {
    // hand-built track: 6 samples of 10 bytes, 2 per chunk, offsets via
    // co64-style longs — the decoder paths encode() never emits
    val t = Mp4.Track(1, "vide", "mp4v", 8, 8, 1000, 240,
      sampleSizes = IndexedSeq.fill(6)(10L),
      sampleToChunk = IndexedSeq((1L, 2L)),
      chunkOffsets = IndexedSeq(1000L, 1020L, 1040L),
      syncSamples = IndexedSeq(1L))
    assert(Mp4.sampleExtent(t, 0).contains((1000L, 10L)))
    assert(Mp4.sampleExtent(t, 1).contains((1010L, 10L)))
    assert(Mp4.sampleExtent(t, 4).contains((1040L, 10L)))
    assert(Mp4.sampleExtent(t, 5).contains((1050L, 10L)))
    assert(Mp4.sampleExtent(t, 6).isEmpty)
  }

  test("stsc runs with varying samples-per-chunk") {
    // chunks: 3 samples, 3 samples, then 1-per-chunk for the rest
    val t = Mp4.Track(1, "vide", "mp4v", 8, 8, 1000, 0,
      sampleSizes = IndexedSeq.tabulate(8)(i => (i + 1).toLong),
      sampleToChunk = IndexedSeq((1L, 3L), (3L, 1L)),
      chunkOffsets = IndexedSeq(100L, 200L, 300L, 400L),
      syncSamples = IndexedSeq.empty)
    // chunk 1: samples 0,1,2 at 100 (+0,+1,+3); chunk 2: 3,4,5 at 200;
    // chunk 3: sample 6 at 300; chunk 4: sample 7 at 400
    assert(Mp4.sampleExtent(t, 2).contains((103L, 3L)))
    assert(Mp4.sampleExtent(t, 4).contains((204L, 5L)))
    assert(Mp4.sampleExtent(t, 6).contains((300L, 7L)))
    assert(Mp4.sampleExtent(t, 7).contains((400L, 8L)))
  }

  test("hostile inputs decode to None, never throw") {
    val good = Mp4.encode(samples(1L, 4), 32, 32, 1000, 40)
    val cases: Seq[Array[Byte]] = Seq(
      null, Array.empty[Byte], Array.fill[Byte](64)(0x42),
      good.take(12),                          // ftyp only, no moov
      good.take(good.length - 40),            // truncated moov
      { val b = good.clone(); b(0) = -1; b(1) = -1; b(2) = -1; b(3) = -1; b }, // huge size
      graft.pipeline.Multimodal.synthPng(8, 8, 1)
    )
    cases.foreach(c => Mp4.decode(c)) // totality
    assert(Mp4.decode(null).isEmpty)
    assert(Mp4.decode(good.take(12)).isEmpty)
    assert(Mp4.decode(Array.fill[Byte](64)(0x42)).isEmpty)
    // corrupt sample table: extent must refuse out-of-file offsets
    val v = Mp4.decode(good).get.videoTracks.head
    val shifted = v.copy(chunkOffsets = v.chunkOffsets.map(_ + good.length))
    assert(Mp4.sampleBytes(good, shifted, 0).isEmpty)
  }

  test("a final overrunning box is a lenient tail, not a decode failure") {
    // crawl-truncated faststart shape: intact ftyp/moov, then an mdat
    // whose declared size overruns the captured bytes
    val good = Mp4.encode(samples(5L, 4), 32, 32, 1000, 40)
    val tail = new java.io.ByteArrayOutputStream()
    tail.write(good)
    tail.write(Array[Byte](0, 0, 4, 0)) // size 1024...
    tail.write("mdat".getBytes("US-ASCII"))
    tail.write(Array.fill[Byte](10)(7)) // ...but only 10 body bytes present
    val v = Mp4.decode(tail.toByteArray)
    assert(v.nonEmpty, "intact moov must survive a truncated trailing box")
    assert(v.get.videoTracks.head.nSamples == 4)
    // structurally broken moov content still fails: truncate INSIDE moov
    assert(Mp4.decode(good.take(good.length - 40)).isEmpty)
  }

  test("stts: uniform encode carries one run; sampleTs is i*delta") {
    val bytes = Mp4.encode(samples(7L, 6), 64, 48, timescale = 1000, sampleDelta = 40)
    val t = Mp4.decode(bytes).get.videoTracks.head
    assert(t.timeToSample == IndexedSeq((6L, 40L)))
    for (i <- 0 until 6) {
      assert(Mp4.sampleTs(t, i).contains(i * 40L))
      assert(Mp4.sampleTsMs(t, i).contains(i * 40L)) // timescale 1000 = ms
    }
    assert(Mp4.sampleTs(t, 6).isEmpty && Mp4.sampleTs(t, -1).isEmpty)
  }

  test("stts: VFR deltas round-trip as RLE runs and prefix-sum timestamps") {
    val deltas = IndexedSeq(33L, 33L, 50L, 33L, 33L, 33L, 100L)
    val bytes = Mp4.encode(samples(9L, 7), 64, 48, timescale = 1000,
      sampleDelta = 40, sampleDeltas = deltas)
    val v = Mp4.decode(bytes).get
    val t = v.videoTracks.head
    assert(t.timeToSample == IndexedSeq((2L, 33L), (1L, 50L), (3L, 33L), (1L, 100L)))
    assert(v.duration == deltas.sum && t.duration == deltas.sum)
    var acc = 0L
    for (i <- 0 until 7) {
      assert(Mp4.sampleTs(t, i).contains(acc), s"sample $i")
      acc += deltas(i)
    }
    // the mdhd-division stand-in would be wrong here: pin one divergence
    val naive = t.duration * 2 / t.nSamples
    assert(Mp4.sampleTs(t, 2).get != naive)
  }

  test("audio track: encodeAudio round-trips handler/entry/samples/timing") {
    val ss = IndexedSeq.tabulate(5)(f =>
      Array.tabulate[Byte](64 + f)(i => ((f * 31 + i) % 256).toByte))
    val bytes = Mp4.encodeAudio(ss, channels = 2, sampleRate = 16000,
      timescale = 16000, sampleDelta = 1024)
    val v = Mp4.decode(bytes).get
    assert(v.brand == "M4A ")
    assert(v.videoTracks.isEmpty && v.audioTracks.length == 1)
    val t = v.audioTracks.head
    assert(t.handler == "soun" && t.codec == "mp4a")
    assert(t.channels == 2 && t.sampleRate == 16000)
    assert(t.syncSamples.isEmpty) // audio: every sample is sync
    assert(t.nSamples == 5)
    for (i <- 0 until 5) {
      assert(Mp4.sampleBytes(bytes, t, i).get.sameElements(ss(i)))
      assert(Mp4.sampleTsMs(t, i).contains(i * 1024L * 1000 / 16000))
    }
  }

  test("avcC: decoder configuration round-trips through an avc1 entry") {
    val cfg = Mp4.AvcConfig(profile = 100, profileCompat = 64, level = 41,
      nalLengthSize = 4,
      sps = IndexedSeq(Array[Byte](0x67, 0x64, 0x00, 0x29),
        Array[Byte](0x67, 0x4d, 0x40, 0x1f, 0x2a)),
      pps = IndexedSeq(Array[Byte](0x68, 0x0b), Array[Byte](0x68, 0x0c, 0x0d),
        Array[Byte](0x68)))
    val ss = IndexedSeq.tabulate(3)(f =>
      Array.tabulate[Byte](40)(i => ((f * 17 + i) % 256).toByte))
    val bytes = Mp4.encode(ss, 64, 48, 1000, 40, codec = "avc1",
      avcC = Some(cfg))
    val t = Mp4.decode(bytes).get.videoTracks.head
    assert(t.codec == "avc1")
    val a = t.avc.get
    assert(a.profile == 100 && a.profileCompat == 64 && a.level == 41)
    assert(a.nalLengthSize == 4)
    assert(a.sps.length == 2 && a.pps.length == 3)
    (a.sps zip cfg.sps).foreach { case (x, y) => assert(x.sameElements(y)) }
    (a.pps zip cfg.pps).foreach { case (x, y) => assert(x.sameElements(y)) }
    // samples are untouched by the avcC child box
    for (i <- 0 until 3)
      assert(Mp4.sampleBytes(bytes, t, i).get.sameElements(ss(i)))
  }

  test("avcC: 2-byte NAL framing and the synth fixture formulas hold") {
    val seed = 7L
    val v = Mp4.decode(graft.pipeline.Video.synthAvcMp4(seed)).get
    val a = v.videoTracks.head.avc.get
    assert(a.profile == 77 && a.level == 33 && a.nalLengthSize == 2)
    assert(a.sps.length == 2 && a.pps.length == 2)
    assert(a.sps.map(_.length) == Seq(5, 6) && a.pps.map(_.length) == Seq(3, 4))
    assert(a.sps.forall(s => (s(0) & 0xff) == 0x67))
    assert(a.pps.forall(p => (p(0) & 0xff) == 0x68))
  }

  test("avcC: malformed records degrade to avc=None, not decode failure") {
    val cfg = Mp4.AvcConfig(66, 0, 30, 4,
      IndexedSeq(Array[Byte](0x67, 1, 2)), IndexedSeq(Array[Byte](0x68)))
    val ss = IndexedSeq(Array.tabulate[Byte](24)(_.toByte))
    val good = Mp4.encode(ss, 32, 24, 1000, 40, codec = "avc1",
      avcC = Some(cfg))
    // find the avcC payload and corrupt the version byte
    def find(pat: String): Int = {
      val p = pat.getBytes("US-ASCII")
      good.indices.find(i => i + p.length <= good.length &&
        p.indices.forall(j => good(i + j) == p(j))).get
    }
    val vOff = find("avcC") + 4
    val badVersion = good.clone(); badVersion(vOff) = 2
    val dv = Mp4.decode(badVersion).get.videoTracks.head
    assert(dv.avc.isEmpty) // container still parses
    // truncate the SPS length so the loop runs out of bounds: shrink the
    // declared SPS byte count past the box end
    val badLen = good.clone(); badLen(vOff + 6) = 0x7f
    assert(Mp4.decode(badLen).get.videoTracks.head.avc.isEmpty)
    // a non-avc1 entry never probes for avcC
    val mp4v = Mp4.encode(ss, 32, 24, 1000, 40)
    assert(Mp4.decode(mp4v).get.videoTracks.head.avc.isEmpty)
  }

  test("nalUnits: AVCC framing walks whole samples or not at all") {
    // 4-byte prefixes: IDR(5) then non-IDR(1)
    val s4 = Array[Byte](0, 0, 0, 3, 0x65, 1, 2, 0, 0, 0, 2, 0x41, 9)
    assert(Mp4.nalUnits(s4, 4).contains(IndexedSeq((5, 3), (1, 2))))
    // 2-byte prefixes
    val s2 = Array[Byte](0, 2, 0x67, 0x64, 0, 1, 0x68)
    assert(Mp4.nalUnits(s2, 2).contains(IndexedSeq((7, 2), (8, 1))))
    // truncated payload, truncated prefix, zero length, bad sizes -> None
    assert(Mp4.nalUnits(s4.dropRight(1), 4).isEmpty)
    assert(Mp4.nalUnits(Array[Byte](0, 0, 0), 4).isEmpty)
    assert(Mp4.nalUnits(Array[Byte](0, 0, 0, 0, 0x65), 4).isEmpty)
    assert(Mp4.nalUnits(s4, 0).isEmpty && Mp4.nalUnits(null, 4).isEmpty)
    // empty sample: zero units, consistent
    assert(Mp4.nalUnits(Array.empty[Byte], 4).contains(IndexedSeq.empty))
  }

  test("nalUnits: synth fixture round-trips framing, types and lengths") {
    for (seed <- 0L to 6L) {
      val bytes = graft.pipeline.Video.synthAvcMp4(seed)
      val t = Mp4.decode(bytes).get.videoTracks.head
      val nls = t.avc.get.nalLengthSize
      assert(t.nSamples == (2 + seed % 3).toInt)
      for (f <- 0 until t.nSamples) {
        val units = Mp4.nalUnits(Mp4.sampleBytes(bytes, t, f).get, nls).get
        assert(units.length == (1 + (seed + f) % 3).toInt)
        units.zipWithIndex.foreach { case ((tp, ln), i) =>
          assert(tp == (if (f % 2 == 0 && i == 0) 5 else 1))
          assert(ln == (20 + (seed + f * 3 + i) % 10).toInt)
        }
        // IDR leads exactly the stss-sync samples (keyEvery = 2)
        assert(units.head._1 == 5 == t.syncSamples.contains((f + 1).toLong))
      }
    }
  }
}
