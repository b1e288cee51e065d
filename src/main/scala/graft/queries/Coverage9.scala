package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.core.Vtt
import graft.pipeline.Audio

/** Audio-modality coverage (SURVEY §2.9 C2/C4 audio leg): real RIFF/WAVE
  * decode distributed over binary columns, windowed VAD-shape analysis,
  * and WebVTT-cue-driven clip cutting — the cluster-side counterpart of
  * the reference's ship-bytes-to-transcription flow
  * (transcription_chunker.py). Fixtures synthesize through the REAL
  * encoder ([[graft.pipeline.Audio.synthWavBytes]]) from pure integer
  * arithmetic, so every oracle recomputes the features analytically —
  * the audio analog of the image family's pixel-luma pins.
  *
  * Payload synthesis is repartitioned by doc_id before the codec stage:
  * the small parquet arrives as one split, and at 100 TB the decode CPU —
  * not the scan — is the cost to spread.
  */
object Coverage9 {
  type Q = (SparkSession, String) => DataFrame

  /** Shared fixture: mono 16-bit WAV per doc, 1600 + (doc_id%7)·320 frames
    * at 16 kHz — lengths deliberately not multiples of the 500-frame
    * analysis window so partial tails are always exercised.
    */
  private def wavDocs(s: SparkSession, d: String, nFrames: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    import s.implicits._
    val mk = udf((id: Long, n: Int) => Audio.synthWavBytes(id, n, 16000))
    load(s, d, "documents").select($"doc_id")
      .repartition($"doc_id")
      .withColumn("wav", mk($"doc_id", nFrames($"doc_id").cast("int")))
  }

  val queries: Map[String, Q] = Map(
    // M6: full decode + integer feature bundle (duration, peak, energy as
    // sum-of-squares, zero-crossings). Gates the encode→decode→feature
    // path end-to-end: the oracle recomputes every number from the synth
    // formula without ever seeing a WAV byte.
    "m6_audio_features" -> ((s, d) => {
      import s.implicits._
      val a = wavDocs(s, d, id => lit(1600) + id % 7 * 320)
      Audio.withAudioFeatures(a, "wav")
        .select($"doc_id", $"audio_rate", $"audio_frames", $"audio_ms",
          $"audio_peak", $"audio_sumsq", $"audio_zc")
        .orderBy($"doc_id")
    }),

    // M7: fixed 500-frame window explode (the VAD shape) — every 4th
    // window of the fixture is a true silence stripe, and no fixture
    // length divides evenly, so both the silence flag and the partial
    // tail are load-bearing.
    "m7_audio_windows" -> ((s, d) => {
      import s.implicits._
      val a = wavDocs(s, d, id => lit(1600) + id % 7 * 320)
      Audio.explodeAudioWindows(a, "wav")
        .select($"doc_id", $"win_idx", $"win_frames", $"win_peak",
          $"win_sumsq", $"is_silent")
        .orderBy($"doc_id", $"win_idx")
    }),

    // M8: WebVTT cues drive real clip cuts. The cue list renders to an
    // actual VTT document and comes back through Vtt.parse (the same
    // parser the transcript path uses), each clip is sliced, RE-ENCODED,
    // and re-decoded, so the oracle pins parse → slice → encode → decode.
    "m8_cue_clips" -> ((s, d) => {
      import s.implicits._
      def ts(ms: Long): String = f"00:${ms / 1000}%02d.${ms % 1000}%03d"
      val mkVtt = udf { (id: Long) =>
        val cues = (0 until 3).map { j =>
          val sm = j * 80 + id % 10
          val em = sm + 30 + (id + j) % 20
          s"${ts(sm)} --> ${ts(em)}\n<v S$j>utterance $j"
        }
        "WEBVTT\n\n" + cues.mkString("\n\n")
      }
      val parseCues = udf((vtt: String) =>
        Vtt.parse(vtt).map(c => (c.startMs, c.endMs)))
      val clip = udf((wav: Array[Byte], sm: Long, em: Long) =>
        Audio.cueClipFeatures(wav, sm, em))
      wavDocs(s, d, _ => lit(4000))
        .withColumn("cues", parseCues(mkVtt($"doc_id")))
        .select($"doc_id", $"wav", posexplode($"cues").as(Seq("cue_idx", "cue")))
        .withColumn("f", clip($"wav", $"cue._1", $"cue._2"))
        .select($"doc_id", $"cue_idx".cast("long").as("cue_idx"),
          $"f._1".as("clip_frames"), $"f._2".as("clip_ms"),
          $"f._3".as("clip_peak"), $"f._4".as("clip_sumsq"))
        .orderBy($"doc_id", $"cue_idx")
    })
  )

  // the synth CASE below is the SQL image of Audio.synthSample — the two
  // must change together
  private val synthV =
    """CASE WHEN (c.doc_id + t.i // 500) % 4 = 0 THEN 0
      |     ELSE (c.doc_id*7919 + t.i*104729 + (t.i*t.i % 99991)*31) % 65536 - 32768 END""".stripMargin

  val oracles: Map[String, String] = Map(
    "m6_audio_features" ->
      s"""WITH c AS (SELECT doc_id FROM documents),
         |s AS (
         | SELECT c.doc_id, t.i, $synthV AS v
         | FROM c JOIN generate_series(0, 3519) t(i)
         |   ON t.i < 1600 + (c.doc_id % 7)*320),
         |z AS (SELECT doc_id, i, v,
         |        lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM s)
         |SELECT doc_id,
         | CAST(16000 AS BIGINT) AS audio_rate,
         | count(*) AS audio_frames,
         | CAST(count(*)*1000//16000 AS BIGINT) AS audio_ms,
         | CAST(max(abs(v)) AS BIGINT) AS audio_peak,
         | CAST(sum(v*v) AS BIGINT) AS audio_sumsq,
         | CAST(count(*) FILTER ((pv < 0) != (v < 0)) AS BIGINT) AS audio_zc
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "m7_audio_windows" ->
      s"""WITH c AS (SELECT doc_id FROM documents),
         |s AS (
         | SELECT c.doc_id, t.i, $synthV AS v
         | FROM c JOIN generate_series(0, 3519) t(i)
         |   ON t.i < 1600 + (c.doc_id % 7)*320)
         |SELECT doc_id, CAST(i // 500 AS BIGINT) AS win_idx,
         | count(*) AS win_frames,
         | CAST(max(abs(v)) AS BIGINT) AS win_peak,
         | CAST(sum(v*v) AS BIGINT) AS win_sumsq,
         | CAST(sum(v*v) = 0 AS BOOLEAN) AS is_silent
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "m8_cue_clips" ->
      s"""WITH q AS (
         | SELECT d.doc_id, j.j AS cue_idx,
         |   j.j*80 + d.doc_id % 10 AS sm,
         |   j.j*80 + d.doc_id % 10 + 30 + (d.doc_id + j.j) % 20 AS em
         | FROM documents d, (VALUES (0), (1), (2)) j(j)),
         |s AS (
         | SELECT q.doc_id, q.cue_idx, t.i, $synthV AS v
         | FROM q AS c JOIN q ON q.doc_id = c.doc_id AND q.cue_idx = c.cue_idx
         | JOIN generate_series(0, 3999) t(i)
         |   ON t.i >= q.sm*16 AND t.i < q.em*16)
         |SELECT doc_id, CAST(cue_idx AS BIGINT) AS cue_idx,
         | count(*) AS clip_frames,
         | CAST(count(*)*1000//16000 AS BIGINT) AS clip_ms,
         | CAST(max(abs(v)) AS BIGINT) AS clip_peak,
         | CAST(sum(v*v) AS BIGINT) AS clip_sumsq
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
