package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.formats.Wav
import graft.formats.Wav.WavAudio

/** Audio-column plumbing (SURVEY §2.9 C2/C4 — the audio leg of the
  * multimodal family). Payloads are opaque `binary` WAV columns; decode /
  * feature-extract / window / cue-clip run distributed via the same
  * iterator-style mapPartitions shape as the image path
  * ([[Multimodal.withMediaFeatures]]), one codec per task. The reference
  * ships audio bytes whole to a transcription service and consumes WebVTT
  * cues back (transcription_chunker.py); here the cue timestamps drive a
  * REAL clip cut through the [[graft.formats.Wav]] codec, so per-utterance
  * audio segments exist as first-class rows a 1000-executor job can fan
  * out over.
  *
  * All features are integer-exact (sum of squares instead of RMS, counts
  * instead of rates) so DuckDB oracles recompute them arithmetically from
  * the synth formula — the same analytic-oracle discipline as the image
  * family's luma pins.
  */
object Audio {

  /** Frames per analysis window — also the silence-stripe period of the
    * synthetic fixture, so windowed queries see both silent and voiced
    * windows AND partial tails (fixture lengths are not multiples of it).
    */
  val WindowFrames = 500

  /** Deterministic synthetic sample: silent stripe every 4th window,
    * otherwise a pseudo-random 16-bit value from pure nonnegative integer
    * arithmetic. EXACTLY mirrored by the m6/m7/m8 oracle SQL — change one,
    * change both.
    */
  def synthSample(seed: Long, i: Long): Int =
    if ((seed + i / WindowFrames) % 4 == 0) 0
    else ((seed * 7919 + i * 104729 + (i * i % 99991) * 31) % 65536 - 32768).toInt

  /** Mono 16-bit PCM fixture payload for `seed`, through the real encoder. */
  def synthWavBytes(seed: Long, nFrames: Int, sampleRate: Int): Array[Byte] = {
    require(nFrames >= 0 && sampleRate >= 1, s"bad fixture geometry $nFrames@$sampleRate")
    val ch = new Array[Int](nFrames)
    var i = 0
    while (i < nFrames) { ch(i) = synthSample(seed, i); i += 1 }
    Wav.encode(WavAudio(sampleRate, 1, 16, Array(ch)))
  }

  /** Integer feature bundle over all channels of a decoded payload:
    * (rate, channels, frames, durationMs, peakAbs, sumSquares,
    * zeroCrossings). Zero-crossings count strict sign flips — sample 0 has
    * no predecessor; 0 counts as nonnegative.
    */
  def features(a: WavAudio): (Int, Int, Int, Long, Long, Long, Long) = {
    var peak = 0L
    var sumsq = 0L
    var zc = 0L
    var c = 0
    while (c < a.channels) {
      val ch = a.samples(c)
      var i = 0
      while (i < ch.length) {
        val v = ch(i).toLong
        val av = math.abs(v)
        if (av > peak) peak = av
        sumsq += v * v
        if (i > 0 && (ch(i - 1) < 0) != (ch(i) < 0)) zc += 1
        i += 1
      }
      c += 1
    }
    (a.sampleRate, a.channels, a.nFrames, a.durationMs, peak, sumsq, zc)
  }

  /** Decode + feature-extract a WAV binary column in partition batches.
    * Appends audio_rate/audio_channels/audio_frames/audio_ms/audio_peak/
    * audio_sumsq/audio_zc (all long). Non-WAV payloads degrade to
    * channels=0 all-zero rows — a mixed binary column never fails the task.
    */
  def withAudioFeatures(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("audio_rate", LongType), StructField("audio_channels", LongType),
      StructField("audio_frames", LongType), StructField("audio_ms", LongType),
      StructField("audio_peak", LongType), StructField("audio_sumsq", LongType),
      StructField("audio_zc", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val f = Wav.decode(r.getAs[Array[Byte]](idx)) match {
          case Some(a) => features(a)
          case None    => (0, 0, 0, 0L, 0L, 0L, 0L)
        }
        Row.fromSeq(r.toSeq ++ Seq(f._1.toLong, f._2.toLong, f._3.toLong, f._4, f._5, f._6, f._7))
      }
    }(enc)
  }

  /** One row per fixed-length analysis window (VAD shape): win_idx,
    * win_frames (partial tail kept), win_peak, win_sumsq, silent flag.
    * Window features cover channel-interleaved totals like [[features]].
    */
  def explodeAudioWindows(df: DataFrame, binCol: String,
      windowFrames: Int = WindowFrames): DataFrame = {
    require(windowFrames >= 1, s"window must be >= 1 frame, got $windowFrames")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("win_idx", LongType), StructField("win_frames", LongType),
      StructField("win_peak", LongType), StructField("win_sumsq", LongType),
      StructField("is_silent", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        Wav.decode(r.getAs[Array[Byte]](idx)) match {
          case None => Iterator.empty
          case Some(a) =>
            val n = a.nFrames
            val nWin = (n + windowFrames - 1) / windowFrames
            Iterator.tabulate(nWin) { w =>
              val from = w * windowFrames
              val until = math.min(from + windowFrames, n)
              var peak = 0L
              var sumsq = 0L
              var c = 0
              while (c < a.channels) {
                val ch = a.samples(c)
                var i = from
                while (i < until) {
                  val v = ch(i).toLong
                  if (math.abs(v) > peak) peak = math.abs(v)
                  sumsq += v * v
                  i += 1
                }
                c += 1
              }
              Row.fromSeq(r.toSeq ++ Seq(w.toLong, (until - from).toLong, peak, sumsq, sumsq == 0L))
            }
        }
      }
    }(enc)
  }

  /** Cut one cue's clip out of a WAV payload and round-trip it through the
    * encoder: returns (clip_frames, clip_ms, clip_peak, clip_sumsq) of the
    * RE-DECODED clip, so the whole slice→encode→decode path is what the
    * oracle gates, not just the arithmetic.
    */
  def cueClipFeatures(bytes: Array[Byte], startMs: Long, endMs: Long): (Long, Long, Long, Long) =
    Wav.decode(bytes) match {
      case None => (0L, 0L, 0L, 0L)
      case Some(a) =>
        val clip = Wav.slice(a, startMs, endMs)
        Wav.decode(Wav.encode(clip)) match {
          case None => (0L, 0L, 0L, 0L)
          case Some(rt) =>
            val f = features(rt)
            (f._3.toLong, f._4, f._5, f._6)
        }
    }
}
