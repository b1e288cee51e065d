package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load
import graft.pipeline.Video

/** Video-modality coverage (SURVEY §2.9 C2 video leg; builder brief
  * "frame-sample" op): real RIFF/AVI container decode distributed over
  * binary columns — metadata probe, stride frame sampling with exact
  * pixel-luma features, and frame-voted perceptual-hash near-dup.
  * Fixtures synthesize through the REAL encoder
  * ([[graft.pipeline.Video.synthAviBytes]]) with raw-DIB frames from pure
  * integer arithmetic, so every oracle recomputes the features
  * analytically without ever seeing an AVI byte — the video analog of the
  * image family's luma pins and the audio family's sample pins.
  *
  * Payload synthesis is repartitioned by doc_id before the codec stage:
  * the small parquet arrives as one split, and at 100 TB the decode CPU —
  * not the scan — is the cost to spread.
  */
object Coverage10 {
  type Q = (SparkSession, String) => DataFrame

  /** Shared fixture: raw-DIB AVI per doc — 4..7 frames at 25 fps, dims
    * 16/20/24 × 12/16 varying with doc_id so no two geometry knobs are
    * correlated with the frame count.
    */
  private def aviDocs(s: SparkSession, d: String) = {
    import s.implicits._
    val mk = udf((id: Long) => Video.synthAviBytes(
      id, (4 + id % 4).toInt, (16 + id % 3 * 4).toInt, (12 + id % 2 * 4).toInt))
    load(s, d, "documents").select($"doc_id")
      .repartition($"doc_id")
      .withColumn("avi", mk($"doc_id"))
  }

  val queries: Map[String, Q] = Map(
    // M9: container metadata probe — header walk only (frame payloads are
    // never pixel-decoded), gating the hdrl/strl/strf parse: geometry,
    // frame count, rate/scale-derived duration, codec fourcc.
    "m9_video_meta" -> ((s, d) => {
      import s.implicits._
      Video.withVideoMeta(aviDocs(s, d), "avi")
        .select($"doc_id", $"video_w", $"video_h", $"video_frames",
          $"video_ms", $"video_codec")
        .orderBy($"doc_id")
    }),

    // M10: every-2nd-frame sampling with exact integer luma sums — the
    // movi walk + bottom-up BGR DIB decode, pinned pixel-exactly: the
    // oracle recomputes every frame's luma sum from the synth formula.
    "m10_video_frames" -> ((s, d) => {
      import s.implicits._
      Video.explodeVideoFrames(aviDocs(s, d), "avi", everyNth = 2)
        .select($"doc_id", $"frame_idx", $"frame_w", $"frame_h", $"frame_luma")
        .orderBy($"doc_id", $"frame_idx")
    }),

    // M12: ISO-BMFF (MP4) metadata probe — ftyp/mvhd/tkhd/hdlr/stsd walk
    // plus sample-table geometry (stsz count, stss keyframe count); mdat
    // is never read. The oracle recomputes every field from the fixture
    // formula.
    "m12_mp4_probe" -> ((s, d) => {
      import s.implicits._
      val mk = udf((id: Long) => Video.synthMp4Bytes(
        id, (5 + id % 6).toInt, (64 + id % 4 * 16).toInt, (48 + id % 3 * 16).toInt))
      val v = load(s, d, "documents").select($"doc_id")
        .repartition($"doc_id").withColumn("mp4", mk($"doc_id"))
      Video.withMp4Meta(v, "mp4")
        .select($"doc_id", $"mp4_brand", $"mp4_ms", $"mp4_w", $"mp4_h",
          $"mp4_codec", $"mp4_samples", $"mp4_keyframes")
        .orderBy($"doc_id")
    }),

    // M13: keyframe sample walk — stss picks the sync samples, stsc/stco/
    // stsz resolve each to its exact byte extent (3-per-chunk layout, so
    // mid-chunk offsets are genuinely summed); byte-exact payload pins.
    "m13_mp4_keyframes" -> ((s, d) => {
      import s.implicits._
      val mk = udf((id: Long) => Video.synthMp4Bytes(
        id, (5 + id % 6).toInt, (64 + id % 4 * 16).toInt, (48 + id % 3 * 16).toInt))
      val v = load(s, d, "documents").select($"doc_id")
        .repartition($"doc_id").withColumn("mp4", mk($"doc_id"))
      Video.explodeMp4Keyframes(v, "mp4")
        .select($"doc_id", $"sample_idx", $"sample_ts", $"sample_len", $"sample_sum")
        .orderBy($"doc_id", $"sample_idx")
    }),

    // M15: audio-track sample walk — 'soun' handler, smhd, an
    // AudioSampleEntry (channels + 16.16 samplerate), AAC-shaped stts
    // (delta 1024 at the sample-rate timescale); every sample resolved to
    // its exact byte extent and decode time. Audio has no stss — every
    // sample is sync — so the walk covers all of them.
    "m15_audio_samples" -> ((s, d) => {
      import s.implicits._
      val mk = udf((id: Long) => Video.synthM4aBytes(id, (4 + id % 5).toInt))
      val v = load(s, d, "documents").select($"doc_id")
        .repartition($"doc_id").withColumn("m4a", mk($"doc_id"))
      Video.explodeMp4AudioSamples(v, "m4a")
        .select($"doc_id", $"sample_idx", $"sample_ts", $"sample_len",
          $"sample_sum", $"audio_channels", $"audio_rate")
        .orderBy($"doc_id", $"sample_idx")
    }),

    // M16: variable-frame-rate sample walk — per-sample stts deltas
    // (30 + (id+f) % 25 media units), so timestamps are true cumulative
    // run sums; a duration-division stand-in would get every mid-stream
    // timestamp wrong. The oracle recomputes the prefix sums analytically.
    "m16_mp4_vfr" -> ((s, d) => {
      import s.implicits._
      val mk = udf((id: Long) => Video.synthVfrMp4Bytes(
        id, (5 + id % 6).toInt, 64, 48))
      val v = load(s, d, "documents").select($"doc_id")
        .repartition($"doc_id").withColumn("mp4", mk($"doc_id"))
      Video.explodeMp4Samples(v, "mp4")
        .select($"doc_id", $"sample_idx", $"sample_ts", $"sample_len")
        .orderBy($"doc_id", $"sample_idx")
    }),

    // M14: mixed-media probe — one binary column carrying AVI, MP4, PNG,
    // junk, FLAC, MP3, and WAV per doc_id mod 7; the unified probe must
    // classify and normalize geometry for all seven without any row
    // failing. The capstone of the every-decoder-is-total discipline.
    // The MP3 rows alternate a leading ID3v2 tag (id % 2) so the tag
    // skip is genuinely exercised.
    "m14_mixed_media" -> ((s, d) => {
      import s.implicits._
      val mk = udf((id: Long) => (id % 7) match {
        case 0 => Video.synthAviBytes(id, (3 + id % 3).toInt, 16, 12)
        case 1 => Video.synthMp4Bytes(id, (4 + id % 5).toInt, 64, 48)
        case 2 => graft.pipeline.Multimodal.synthPng(
          (10 + id % 6).toInt, (8 + id % 4).toInt, id)
        case 3 => Array.tabulate[Byte](32)(i => ((id * 7 + i) % 256).toByte)
        case 4 => graft.formats.Flac.encode(graft.formats.Flac.FlacInfo(
          sampleRate = 16000 * (1 + id % 3).toInt, channels = (1 + id % 2).toInt,
          bitsPerSample = 16,
          totalSamples = (1 + id % 5) * 4000L * (1 + id % 3)))
        case 5 => graft.formats.Mp3.encode((3 + id % 5).toInt, mpegVersion = 1,
          rateIdx = 2, brIdx = 9, mono = id % 2 == 0, seed = id,
          id3Bytes = if (id % 2 == 0) 17 else 0)
        case _ => graft.pipeline.Audio.synthWavBytes(
          id, ((1 + id % 4) * 400).toInt, 8000)
      })
      val v = load(s, d, "documents").select($"doc_id")
        .repartition($"doc_id").withColumn("media", mk($"doc_id"))
      Video.withMediaProbe(v, "media")
        .select($"doc_id", $"media_kind", $"media_w", $"media_h",
          $"media_frames", $"media_ms")
        .orderBy($"doc_id")
    }),

    // M11: frame-voted video near-dup — each doc renders its group's
    // spectral frame sequence (seed = doc_id % 20) at a doc-specific pixel
    // size, so every cluster mixes NINE resolutions of the "same" video;
    // per-slot frame pHashes must vote the group back together (≥2 of 3
    // slots within Hamming ≤ 3) without ever merging different groups.
    // The oracle predicts the full clustering from the planted groups.
    "m11_video_neardup" -> ((s, d) => {
      import s.implicits._
      // 3 frames: with 3 slots the sampler hashes frames 0,1,2 — a 4th
      // frame would be rendered and never hashed (pure fixture waste)
      val mk = udf((id: Long) => Video.synthSpectralAvi(
        id % 20, 3, (48 + id % 3 * 16).toInt, (48 + (id / 3) % 3 * 16).toInt))
      val docs = load(s, d, "documents").select($"doc_id")
      // the encoded AVIs are FIXTURE (a real corpus arrives with videos
      // already on disk) — memoized + checkpointed so the bench times
      // decode + per-frame pHash + voting, not the synthesis/encode pass
      val vids = Fixtures.cached(s, s"m11_avi:$d")(
        docs.repartition($"doc_id").withColumn("avi", mk($"doc_id")))
      // low star-expansion cap, as in m5: resolution-variant groups are
      // mega-clusters of near-identical hashes
      val pairs = Video.videoNearDupPairs(vids, "doc_id", "avi",
        slots = 3, maxHamming = 3, minVotes = 2, maxBucketSize = 64)
      val clusters = graft.operators.Dedup.nearDupClusters(
        docs.select($"doc_id".as("id")), pairs)
      docs.select($"doc_id".as("id"))
        .join(clusters, Seq("id"), "left")
        .select($"id", coalesce($"cluster", $"id").as("rep_id"))
        .groupBy($"rep_id").agg(count(lit(1)).as("n_docs"))
        .orderBy($"rep_id")
    }),

    // M17: H.264 avcC decoder-configuration probe (r11; VERDICT r10
    // next-round #8) — 'avc1' sample entries carry the
    // AVCDecoderConfigurationRecord a real video pipeline reads right
    // after keyframe extents: profile/level for capability routing, NAL
    // length framing, and the SPS/PPS parameter sets. Fixtures go
    // through the real encoder (Mp4.encode with an avcC child box); the
    // oracle recomputes every surfaced field arithmetically from
    // Video.synthAvcConfig's seed formulas. Header-only: the probe never
    // touches sample payloads.
    "m17_avcc_probe" -> ((s, d) => {
      import s.implicits._
      val mk = udf((id: Long) => Video.synthAvcMp4(id))
      val probe = udf((b: Array[Byte]) =>
        graft.formats.Mp4.decode(b)
          .flatMap(_.videoTracks.headOption).flatMap(_.avc)
          .map(c => (c.profile, c.profileCompat, c.level, c.nalLengthSize,
            c.sps.length, c.pps.length,
            c.sps.map(_.length).sum, c.pps.map(_.length).sum)))
      load(s, d, "documents").select($"doc_id")
        .repartition($"doc_id")
        .withColumn("a", probe(mk($"doc_id")))
        .select($"doc_id",
          $"a._1".as("avc_profile"), $"a._2".as("profile_compat"),
          $"a._3".as("avc_level"), $"a._4".as("nal_length_size"),
          $"a._5".as("n_sps"), $"a._6".as("n_pps"),
          $"a._7".as("sps_bytes"), $"a._8".as("pps_bytes"))
        .orderBy($"doc_id")
    }),

    // M18: NAL-unit sample walk — m17's completion: resolve every sample
    // through the stsc/stco/stsz tables, then split its AVCC framing
    // (avcC-declared 4- or 2-byte length prefixes) into NAL units.
    // (sample, nal) → (type, payload length), the structure a keyframe
    // counter / bitstream filter reads; IDR placement must agree with
    // the encoder's stss cadence. Full per-unit row set hash-matched
    // against the synth formulas.
    "m18_nal_units" -> ((s, d) => {
      import s.implicits._
      val mk = udf((id: Long) => Video.synthAvcMp4(id))
      val walk = udf((b: Array[Byte]) => {
        import graft.formats.Mp4
        Mp4.decode(b).flatMap(_.videoTracks.headOption).toSeq.flatMap { t =>
          val nls = t.avc.map(_.nalLengthSize).getOrElse(4)
          (0 until t.nSamples).flatMap { i =>
            Mp4.sampleBytes(b, t, i).toSeq.flatMap { sm =>
              Mp4.nalUnits(sm, nls).getOrElse(IndexedSeq.empty)
                .zipWithIndex.map { case ((tp, ln), j) => (i, j, tp, ln) }
            }
          }
        }
      })
      load(s, d, "documents").select($"doc_id")
        .repartition($"doc_id")
        .select($"doc_id", explode(walk(mk($"doc_id"))).as("n"))
        .select($"doc_id", $"n._1".as("sample_idx"), $"n._2".as("nal_idx"),
          $"n._3".as("nal_type"), $"n._4".as("nal_len"))
        .orderBy($"doc_id", $"sample_idx", $"nal_idx")
    })
  )

  // the synth CASE below is the SQL image of Video.synthRgb — the two
  // must change together
  private val lumaV =
    """(299*((doc_id*31 + f.f*17 + x.x*7 + y.y*13) % 256)
      | + 587*((doc_id*59 + f.f*23 + x.x*11 + y.y*5) % 256)
      | + 114*((doc_id*97 + f.f*29 + x.x*3 + y.y*19) % 256)) // 1000""".stripMargin

  val oracles: Map[String, String] = Map(
    "m9_video_meta" ->
      """SELECT doc_id,
        | CAST(16 + doc_id % 3 * 4 AS BIGINT) AS video_w,
        | CAST(12 + doc_id % 2 * 4 AS BIGINT) AS video_h,
        | CAST(4 + doc_id % 4 AS BIGINT) AS video_frames,
        | CAST((4 + doc_id % 4) * 40 AS BIGINT) AS video_ms,
        | 'DIB' AS video_codec
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m10_video_frames" ->
      s"""WITH d AS (
         | SELECT doc_id, 16 + doc_id % 3 * 4 AS w, 12 + doc_id % 2 * 4 AS h,
         |        4 + doc_id % 4 AS nf
         | FROM documents),
         |f AS (SELECT d.* , t.f FROM d JOIN generate_series(0, 6) t(f)
         |        ON t.f < d.nf AND t.f % 2 = 0),
         |p AS (
         | SELECT f.doc_id, f.f, f.w, f.h, $lumaV AS l
         | FROM f JOIN generate_series(0, 23) x(x) ON x.x < f.w
         |        JOIN generate_series(0, 15) y(y) ON y.y < f.h)
         |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
         | CAST(w AS INTEGER) AS frame_w, CAST(h AS INTEGER) AS frame_h,
         | CAST(sum(l) AS BIGINT) AS frame_luma
         |FROM p GROUP BY doc_id, f, w, h ORDER BY doc_id, f""".stripMargin,
    // flac: rate 16000·(1+id%3), samples (1+id%5)·4000·(1+id%3) → ms =
    // (1+id%5)·250; mp3: 3+id%5 frames of 1152 samples at 32 kHz → ms =
    // nFrames·36; wav: (1+id%4)·400 frames at 8 kHz → ms = (1+id%4)·50
    "m14_mixed_media" ->
      """SELECT doc_id,
        | CASE doc_id % 7 WHEN 0 THEN 'avi' WHEN 1 THEN 'mp4'
        |                 WHEN 2 THEN 'image' WHEN 3 THEN 'unknown'
        |                 WHEN 4 THEN 'flac' WHEN 5 THEN 'mp3'
        |                 ELSE 'wav' END AS media_kind,
        | CAST(CASE doc_id % 7 WHEN 0 THEN 16 WHEN 1 THEN 64
        |                      WHEN 2 THEN 10 + doc_id % 6 ELSE 0 END AS BIGINT) AS media_w,
        | CAST(CASE doc_id % 7 WHEN 0 THEN 12 WHEN 1 THEN 48
        |                      WHEN 2 THEN 8 + doc_id % 4 ELSE 0 END AS BIGINT) AS media_h,
        | CAST(CASE doc_id % 7 WHEN 0 THEN 3 + doc_id % 3 WHEN 1 THEN 4 + doc_id % 5
        |                      WHEN 2 THEN 1 WHEN 3 THEN 0
        |                      WHEN 4 THEN (1 + doc_id % 5) * 4000 * (1 + doc_id % 3)
        |                      WHEN 5 THEN 3 + doc_id % 5
        |                      ELSE (1 + doc_id % 4) * 400 END AS BIGINT) AS media_frames,
        | CAST(CASE doc_id % 7 WHEN 0 THEN (3 + doc_id % 3) * 40
        |                      WHEN 1 THEN (4 + doc_id % 5) * 40
        |                      WHEN 4 THEN (1 + doc_id % 5) * 250
        |                      WHEN 5 THEN (3 + doc_id % 5) * 36
        |                      WHEN 6 THEN (1 + doc_id % 4) * 50
        |                      ELSE 0 END AS BIGINT) AS media_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m12_mp4_probe" ->
      """SELECT doc_id, 'isom' AS mp4_brand,
        | CAST((5 + doc_id % 6) * 40 AS BIGINT) AS mp4_ms,
        | CAST(64 + doc_id % 4 * 16 AS BIGINT) AS mp4_w,
        | CAST(48 + doc_id % 3 * 16 AS BIGINT) AS mp4_h,
        | 'mp4v' AS mp4_codec,
        | CAST(5 + doc_id % 6 AS BIGINT) AS mp4_samples,
        | CAST((5 + doc_id % 6 + 1) // 2 AS BIGINT) AS mp4_keyframes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the byte formula is the SQL image of Video.synthMp4Byte — the two
    // must change together
    "m13_mp4_keyframes" ->
      """WITH d AS (SELECT doc_id, 5 + doc_id % 6 AS n FROM documents),
        |f AS (SELECT d.doc_id, t.f, 100 + (d.doc_id + t.f) % 50 AS len
        |      FROM d JOIN generate_series(0, 10) t(f) ON t.f < d.n AND t.f % 2 = 0),
        |s AS (SELECT f.doc_id, f.f, f.len, (f.doc_id*13 + f.f*7 + i.i) % 256 AS b
        |      FROM f JOIN generate_series(0, 149) i(i) ON i.i < f.len)
        |SELECT doc_id, CAST(f AS INTEGER) AS sample_idx,
        | CAST(f * 40 AS BIGINT) AS sample_ts,
        | CAST(len AS BIGINT) AS sample_len, CAST(sum(b) AS BIGINT) AS sample_sum
        |FROM s GROUP BY doc_id, f, len ORDER BY doc_id, f""".stripMargin,
    // byte formula mirrors Video.synthM4aBytes; ts = f·1024·1000/rate with
    // rate = 8000·2^(id%3), so ts = f·(128 >> (id%3)) exactly
    "m15_audio_samples" ->
      """WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS n FROM documents),
        |f AS (SELECT d.doc_id, t.f, 60 + (d.doc_id + t.f) % 30 AS len
        |      FROM d JOIN generate_series(0, 8) t(f) ON t.f < d.n),
        |s AS (SELECT f.doc_id, f.f, f.len, (f.doc_id*11 + f.f*5 + i.i) % 256 AS b
        |      FROM f JOIN generate_series(0, 89) i(i) ON i.i < f.len)
        |SELECT doc_id, CAST(f AS INTEGER) AS sample_idx,
        | CAST(f * (128 >> (doc_id % 3)) AS BIGINT) AS sample_ts,
        | CAST(len AS BIGINT) AS sample_len, CAST(sum(b) AS BIGINT) AS sample_sum,
        | CAST(1 + doc_id % 2 AS INTEGER) AS audio_channels,
        | CAST(8000 * (1 << (doc_id % 3)) AS INTEGER) AS audio_rate
        |FROM s GROUP BY doc_id, f, len ORDER BY doc_id, f""".stripMargin,
    // delta formula mirrors Video.synthVfrMp4Bytes; ts(f) is the prefix
    // sum of the deltas of samples 0..f-1
    "m16_mp4_vfr" ->
      """WITH d AS (SELECT doc_id, 5 + doc_id % 6 AS n FROM documents),
        |f AS (SELECT d.doc_id, t.f, 80 + (d.doc_id + t.f) % 40 AS len,
        |             30 + (d.doc_id + t.f) % 25 AS delta
        |      FROM d JOIN generate_series(0, 10) t(f) ON t.f < d.n)
        |SELECT doc_id, CAST(f AS INTEGER) AS sample_idx,
        | CAST(COALESCE(sum(delta) OVER (PARTITION BY doc_id ORDER BY f
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sample_ts,
        | CAST(len AS BIGINT) AS sample_len
        |FROM f ORDER BY doc_id, f""".stripMargin,
    // m11's clustering is fully determined by the planted seed groups: the
    // per-slot probe margins (in-group ≤ 3 bits at every size pairing,
    // cross-group ~32) leave the 2-of-3 vote no way to split or merge
    "m11_video_neardup" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS rep_id, count(*) AS n_docs
        |FROM documents GROUP BY doc_id % 20 ORDER BY 1""".stripMargin,
    // the SQL image of Video.synthAvcConfig: sps i has 5+i bytes, pps i
    // has 3+i bytes, so the byte sums collapse to CASE over the counts
    "m17_avcc_probe" ->
      """SELECT doc_id,
        | CAST(CASE doc_id % 3 WHEN 0 THEN 66 WHEN 1 THEN 77
        |                      ELSE 100 END AS INTEGER) AS avc_profile,
        | CAST((doc_id % 2) * 64 AS INTEGER) AS profile_compat,
        | CAST(30 + doc_id % 4 AS INTEGER) AS avc_level,
        | CAST(CASE doc_id % 2 WHEN 0 THEN 4 ELSE 2 END AS INTEGER) AS nal_length_size,
        | CAST(1 + doc_id % 2 AS INTEGER) AS n_sps,
        | CAST(1 + doc_id % 3 AS INTEGER) AS n_pps,
        | CAST(CASE doc_id % 2 WHEN 0 THEN 5 ELSE 11 END AS INTEGER) AS sps_bytes,
        | CAST(CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 7
        |                      ELSE 12 END AS INTEGER) AS pps_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the SQL image of Video.synthAvcMp4's NAL layout: sample f of doc
    // has 1+(doc_id+f)%3 NALs, IDR (type 5) leads every even sample,
    // NAL i of sample f has 20+(doc_id+f*3+i)%10 payload bytes
    "m18_nal_units" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS ns FROM documents),
        |f AS (SELECT d.doc_id, t.f, 1 + (d.doc_id + t.f) % 3 AS nn
        |      FROM d JOIN generate_series(0, 4) t(f) ON t.f < d.ns),
        |n AS (SELECT f.doc_id, f.f, u.i
        |      FROM f JOIN generate_series(0, 3) u(i) ON u.i < f.nn)
        |SELECT doc_id, CAST(f AS INTEGER) AS sample_idx,
        | CAST(i AS INTEGER) AS nal_idx,
        | CAST(CASE WHEN f % 2 = 0 AND i = 0 THEN 5 ELSE 1 END AS INTEGER) AS nal_type,
        | CAST(20 + (doc_id + f * 3 + i) % 10 AS INTEGER) AS nal_len
        |FROM n ORDER BY doc_id, f, i""".stripMargin
  )
}
