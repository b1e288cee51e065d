package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.formats.Avi

/** The video leg of the multimodal family (Coverage10 m9/m10/m11):
  * synth → real RIFF/AVI encode → distributed container decode → frame
  * features / slot hashes. Pixel assertions recompute expectations from
  * [[Video.synthRgb]] directly, never from the codec under test; the
  * voting near-dup assertions pin the pHash margins the m11 oracle
  * depends on (in-group across sizes, cross-group, MJPEG re-encode).
  */
class VideoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def luma(rgb: Int): Int =
    (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000

  private def expectedLuma(seed: Long, f: Int, w: Int, h: Int): Long = {
    var s = 0L
    for (y <- 0 until h; x <- 0 until w) s += luma(Video.synthRgb(seed, f, x, y))
    s
  }

  test("synth fixture round-trips the real encoder pixel-exactly") {
    val bytes = Video.synthAviBytes(9L, nFrames = 5, w = 11, h = 6)
    val v = Avi.decode(bytes).get
    assert(v.width == 11 && v.height == 6 && v.nFrames == 5 && v.codec == Avi.CodecDib)
    for (f <- 0 until 5) {
      val img = Avi.frameImage(v, f).get
      for (y <- 0 until 6; x <- 0 until 11)
        assert((img.getRGB(x, y) & 0xffffff) == Video.synthRgb(9L, f, x, y),
          s"frame $f pixel ($x,$y)")
    }
  }

  test("withVideoMeta probes geometry/timing; junk degrades to zeros") {
    import spark.implicits._
    val mk = udf((id: Long) =>
      if (id == 2L) Array.fill[Byte](32)(0x42)
      else Video.synthAviBytes(id, (3 + id).toInt, 8, 8, rate = 20))
    val df = Video.withVideoMeta(
      Seq(0L, 1L, 2L).toDF("id").withColumn("avi", mk($"id")), "avi")
      .select("id", "video_w", "video_frames", "video_ms", "video_codec")
      .orderBy("id").collect()
    assert(df(0).getLong(1) == 8 && df(0).getLong(2) == 3 && df(0).getLong(3) == 150)
    assert(df(1).getLong(2) == 4 && df(1).getLong(3) == 200)
    assert(df(0).getString(4) == "DIB")
    assert(df(2).getLong(1) == 0 && df(2).getLong(2) == 0 && df(2).getString(4) == "")
  }

  test("explodeVideoFrames samples the stride and pins exact luma sums") {
    import spark.implicits._
    val mk = udf((id: Long) => Video.synthAviBytes(id, 7, 10, 5))
    val rows = Video.explodeVideoFrames(
      Seq(4L, 5L).toDF("id").withColumn("avi", mk($"id")), "avi", everyNth = 3)
      .select("id", "frame_idx", "frame_w", "frame_h", "frame_luma")
      .orderBy("id", "frame_idx").collect()
    // frames 0, 3, 6 of each video
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((4L, 0), (4L, 3), (4L, 6), (5L, 0), (5L, 3), (5L, 6)))
    rows.foreach { r =>
      assert(r.getInt(2) == 10 && r.getInt(3) == 5)
      assert(r.getLong(4) == expectedLuma(r.getLong(0), r.getInt(1), 10, 5),
        s"id ${r.getLong(0)} frame ${r.getInt(1)}")
    }
  }

  test("slot hashes: in-group margins hold across sizes and MJPEG re-encode") {
    // the exact m11 geometry: group seed rendered at nine pixel sizes
    val sizes = for (a <- 0 until 3; b <- 0 until 3) yield (48 + a * 16, 48 + b * 16)
    val seed = 7L
    val all = sizes.map { case (w, h) =>
      Video.slotHashes(Video.synthSpectralAvi(seed, 4, w, h), slots = 3)
    }
    all.foreach(hs => assert(hs.map(_._1) == Seq(0, 1, 2)))
    // every size pair, every slot: within the m11 vote threshold
    for (i <- all.indices; j <- i + 1 until all.size; s <- 0 until 3) {
      val d = java.lang.Long.bitCount(all(i)(s)._2 ^ all(j)(s)._2)
      assert(d <= 3, s"sizes $i vs $j slot $s hamming $d")
    }
    // MJPEG re-encode of the same content stays within the threshold on
    // a 2-of-3 vote (lossy noise may push one slot over)
    val jm = Video.slotHashes(Video.synthSpectralAvi(seed, 4, 64, 64, mjpeg = true), 3)
    val base = Video.slotHashes(Video.synthSpectralAvi(seed, 4, 64, 64), 3)
    val votes = (0 until 3).count(s =>
      java.lang.Long.bitCount(jm(s)._2 ^ base(s)._2) <= 3)
    assert(votes >= 2, s"MJPEG votes $votes")
    // cross-group: different seeds disagree on ~half the bits every slot
    val other = Video.slotHashes(Video.synthSpectralAvi(8L, 4, 64, 64), 3)
    for (s <- 0 until 3) {
      val d = java.lang.Long.bitCount(base(s)._2 ^ other(s)._2)
      assert(d >= 16, s"cross-group slot $s hamming only $d")
    }
  }

  test("videoNearDupPairs votes groups together and keeps groups apart") {
    import spark.implicits._
    // 12 videos, 3 planted groups of 4, each member at a different size;
    // one junk payload that must simply drop out
    val rows = (0 until 12).map { i =>
      val g = i % 3
      val (w, h) = (48 + (i / 3) % 2 * 16, 48 + (i / 6) * 16)
      (i.toLong, Video.synthSpectralAvi(g.toLong, 4, w, h))
    } :+ (99L, Array.fill[Byte](16)(0x13))
    val df = rows.toDF("id", "avi")
    val pairs = Video.videoNearDupPairs(df, "id", "avi",
      slots = 3, maxHamming = 3, minVotes = 2, maxBucketSize = 64).collect()
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- 0 until 12; b <- a + 1 until 12; if a % 3 == b % 3
    } yield (a.toLong, b.toLong)).toSet
    assert(got == want)
    // votes are unanimous within planted groups on clean renders
    assert(pairs.forall(_.getInt(2) == 3))
  }

  test("voting blocks single-slot coincidences (minVotes gate)") {
    import spark.implicits._
    // two videos sharing ONE identical frame (a title card) but otherwise
    // different groups: 1 vote < minVotes=2 → no pair
    def mixed(id: Long, group: Long): Array[Byte] = {
      val shared = Multimodal.spectralImage(777L, 48, 48) // common title card
      val frames = IndexedSeq.tabulate(4) { f =>
        if (f == 0) Avi.encodeDibFrame(shared)
        else Avi.encodeDibFrame(Multimodal.spectralImage(group * 131 + f, 48, 48))
      }
      Avi.encode(Avi.AviVideo(48, 48, 1, 25, Avi.CodecDib, frames))
    }
    val df = Seq((1L, mixed(1L, 10L)), (2L, mixed(2L, 20L))).toDF("id", "avi")
    val pairs = Video.videoNearDupPairs(df, "id", "avi",
      slots = 3, maxHamming = 3, minVotes = 2, maxBucketSize = 64)
    assert(pairs.count() == 0)
    // with minVotes=1 the shared title card DOES pair them — the gate is
    // what blocks it
    val loose = Video.videoNearDupPairs(df, "id", "avi",
      slots = 3, maxHamming = 3, minVotes = 1, maxBucketSize = 64).collect()
    assert(loose.length == 1 && loose(0).getInt(2) == 1)
  }

  test("mixed-media probe classifies AVI/MP4/image/junk in one column") {
    import spark.implicits._
    val rows = Seq(
      (0L, Video.synthAviBytes(0L, 4, 10, 8)),
      (1L, Video.synthMp4Bytes(1L, 5, 32, 24)),
      (2L, Multimodal.synthPng(7, 5, 3L)),
      (3L, Array.fill[Byte](20)(0x5a)),
      (4L, Array.empty[Byte]),
      (5L, null.asInstanceOf[Array[Byte]]))
    val out = Video.withMediaProbe(rows.toDF("id", "media"), "media")
      .select("id", "media_kind", "media_w", "media_h", "media_frames", "media_ms")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out(0) == ((0L, "avi", 10L, 8L, 4L, 160L)))
    assert(out(1) == ((1L, "mp4", 32L, 24L, 5L, 200L)))
    assert(out(2) == ((2L, "image", 7L, 5L, 1L, 0L)))
    assert(out(3) == ((3L, "unknown", 0L, 0L, 0L, 0L)))
    assert(out(4) == ((4L, "unknown", 0L, 0L, 0L, 0L)))
    assert(out(5) == ((5L, "unknown", 0L, 0L, 0L, 0L)))
  }
}
