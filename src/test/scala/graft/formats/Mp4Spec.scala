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
}
