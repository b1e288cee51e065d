package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.formats.Wav

/** The audio leg of the multimodal family (Coverage9 m6/m7/m8): synth →
  * real RIFF encode → distributed decode → integer features. Every
  * assertion recomputes expectations from [[Audio.synthSample]] directly,
  * never from the codec under test.
  */
class AudioSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def expectedSamples(seed: Long, n: Int): Array[Int] =
    Array.tabulate(n)(i => Audio.synthSample(seed, i.toLong))

  test("synth fixture round-trips the real encoder byte path") {
    val n = 1234
    val bytes = Audio.synthWavBytes(7L, n, 16000)
    val a = Wav.decode(bytes).get
    assert(a.sampleRate == 16000 && a.channels == 1 && a.nFrames == n)
    assert(a.samples(0).sameElements(expectedSamples(7L, n)))
  }

  test("silence stripe: every 4th window of the fixture is all-zero") {
    val seed = 3L
    val n = Audio.WindowFrames * 6
    val s = expectedSamples(seed, n)
    (0 until 6).foreach { w =>
      val win = s.slice(w * Audio.WindowFrames, (w + 1) * Audio.WindowFrames)
      val silent = (seed + w) % 4 == 0
      assert(win.forall(_ == 0) == silent, s"window $w silent=$silent")
    }
  }

  test("features match a direct recomputation (peak/sumsq/zero-crossings)") {
    val n = 2000
    val seed = 11L
    val (_, _, frames, ms, peak, sumsq, zc) =
      Audio.features(Wav.decode(Audio.synthWavBytes(seed, n, 16000)).get)
    val s = expectedSamples(seed, n)
    assert(frames == n && ms == n * 1000L / 16000)
    assert(peak == s.map(v => math.abs(v.toLong)).max)
    assert(sumsq == s.map(v => v.toLong * v).sum)
    val expZc = (1 until n).count(i => (s(i - 1) < 0) != (s(i) < 0))
    assert(zc == expZc)
  }

  test("withAudioFeatures distributes and degrades non-WAV payloads to zeros") {
    import spark.implicits._
    val mk = udf((id: Long) => Audio.synthWavBytes(id, 800, 16000))
    val good = Seq(1L, 2L, 3L).toDF("doc_id").withColumn("wav", mk($"doc_id"))
    val bad = Seq(99L).toDF("doc_id")
      .withColumn("wav", lit("not a riff file".getBytes("UTF-8")))
    val out = Audio.withAudioFeatures(good.unionByName(bad), "wav")
      .select($"doc_id", $"audio_channels", $"audio_frames", $"audio_peak")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 800)
    assert(out(99L) == ((0L, 0L, 0L)), "non-WAV row degrades, never throws")
  }

  test("explodeAudioWindows keeps the partial tail and flags silence") {
    import spark.implicits._
    val seed = 4L // (4 + w) % 4 == 0 at w=0,4,...
    val n = Audio.WindowFrames * 2 + 123
    val mk = udf((id: Long) => Audio.synthWavBytes(id, n, 16000))
    val df = Seq(seed).toDF("doc_id").withColumn("wav", mk($"doc_id"))
    val wins = Audio.explodeAudioWindows(df, "wav")
      .orderBy($"win_idx")
      .select($"win_idx", $"win_frames", $"win_sumsq", $"is_silent")
      .collect()
    assert(wins.length == 3)
    assert(wins.map(_.getLong(1)).toSeq == Seq(500L, 500L, 123L))
    assert(wins(0).getBoolean(3), "window 0 is the silence stripe for seed 4")
    assert(!wins(1).getBoolean(3) && wins(1).getLong(2) > 0)
  }

  test("cueClipFeatures equals features of the arithmetic slice (encode round-trip included)") {
    val seed = 9L
    val bytes = Audio.synthWavBytes(seed, 4000, 16000)
    val (sm, em) = (37L, 171L)
    val (frames, ms, peak, sumsq) = Audio.cueClipFeatures(bytes, sm, em)
    val s = expectedSamples(seed, 4000).slice((sm * 16).toInt, (em * 16).toInt)
    assert(frames == s.length && ms == s.length * 1000L / 16000)
    assert(peak == s.map(v => math.abs(v.toLong)).max)
    assert(sumsq == s.map(v => v.toLong * v).sum)
  }

  test("cue clip clamps out-of-range cues instead of failing") {
    val bytes = Audio.synthWavBytes(2L, 160, 16000) // 10ms of audio
    assert(Audio.cueClipFeatures(bytes, 5L, 5000L)._1 == 160 - 80)
    assert(Audio.cueClipFeatures(bytes, 900L, 950L)._1 == 0)
    assert(Audio.cueClipFeatures("junk".getBytes, 0L, 10L) == ((0L, 0L, 0L, 0L)))
  }
}
