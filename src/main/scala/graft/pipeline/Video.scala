package graft.pipeline

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.formats.Avi
import graft.formats.Avi.AviVideo

/** Video-column plumbing (SURVEY §2.9 C2 — the video leg of the
  * multimodal family; builder brief "frame-sample" op). Payloads are
  * opaque `binary` AVI columns; metadata probe / frame sampling /
  * per-frame features / frame perceptual hashes run distributed with one
  * container decode per row, the same mapPartitions shape as the image
  * and audio paths. Unlike the previous byte-frame stand-in
  * ([[Multimodal.sampleFrames]]), this is a REAL container walk
  * ([[graft.formats.Avi]]): raw-DIB frames decode integer-exactly (so
  * DuckDB oracles recompute pixel sums arithmetically) and MJPEG frames
  * decode through `javax.imageio`.
  *
  * At 100 TB the decode CPU — not the scan — is the cost to spread:
  * callers repartition by id before the codec stage, frame features
  * explode one row per SAMPLED frame (a stride-`everyNth` walk never
  * materializes unsampled pixels), and the near-dup path reduces each
  * video to `slots` 64-bit hashes before anything shuffles.
  */
object Video {

  /** Deterministic synthetic pixel channels — pure nonnegative integer
    * arithmetic, EXACTLY mirrored by the m9/m10 oracle SQL (change one,
    * change both). Returns packed 0xRRGGBB.
    */
  def synthRgb(seed: Long, f: Int, x: Int, y: Int): Int = {
    val r = ((seed * 31 + f * 17 + x * 7L + y * 13L) % 256).toInt
    val g = ((seed * 59 + f * 23 + x * 11L + y * 5L) % 256).toInt
    val b = ((seed * 97 + f * 29 + x * 3L + y * 19L) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Raw-DIB AVI fixture payload for `seed`, through the real encoder. */
  def synthAviBytes(seed: Long, nFrames: Int, w: Int, h: Int,
      rate: Int = 25): Array[Byte] = {
    require(nFrames >= 0 && w >= 1 && h >= 1, s"bad fixture geometry ${w}x$h×$nFrames")
    val frames = IndexedSeq.tabulate(nFrames) { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, synthRgb(seed, f, x, y)); x += 1 }
        y += 1
      }
      Avi.encodeDibFrame(img)
    }
    Avi.encode(AviVideo(w, h, 1, rate, Avi.CodecDib, frames))
  }

  /** Spectral-pattern fixture: frame `f` renders
    * [[Multimodal.spectralImage]] with seed `groupSeed·131 + f`, so two
    * videos with the same groupSeed carry the SAME normalized frame
    * content at any pixel size — the scale-invariance contract frame
    * perceptual hashes recover. DIB or MJPEG per the flag.
    */
  def synthSpectralAvi(groupSeed: Long, nFrames: Int, w: Int, h: Int,
      mjpeg: Boolean = false, rate: Int = 25): Array[Byte] = {
    val frames = IndexedSeq.tabulate(nFrames) { f =>
      val img = Multimodal.spectralImage(groupSeed * 131 + f, w, h)
      if (mjpeg) {
        // JPEG writers reject TYPE_BYTE_GRAY in some configs — go RGB
        val rgb = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        rgb.getGraphics.drawImage(img, 0, 0, null)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(rgb, "jpg", bos)
        bos.toByteArray
      } else Avi.encodeDibFrame(img)
    }
    Avi.encode(AviVideo(w, h, 1, rate,
      if (mjpeg) Avi.CodecMjpg else Avi.CodecDib, frames))
  }

  /** ITU-R 601 integer luma — the same formula as the image path. */
  private def luma(rgb: Int): Int =
    (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000

  private def lumaSumOf(img: BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { sum += luma(img.getRGB(x, y)); x += 1 }
      y += 1
    }
    sum
  }

  /** Container metadata probe — header walk only, frame payloads stay
    * encoded. Appends video_w/video_h/video_frames/video_ms (long) and
    * video_codec (string); non-AVI payloads degrade to all-zero/"" rows.
    */
  def withVideoMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("video_w", LongType), StructField("video_h", LongType),
      StructField("video_frames", LongType), StructField("video_ms", LongType),
      StructField("video_codec", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = Avi.decode(r.getAs[Array[Byte]](idx)) match {
          case Some(v) => Seq(v.width.toLong, v.height.toLong,
            v.nFrames.toLong, v.durationMs, v.codec.trim)
          case None => Seq(0L, 0L, 0L, 0L, "")
        }
        Row.fromSeq(r.toSeq ++ m)
      }
    }(enc)
  }

  /** One row per SAMPLED frame (stride `everyNth` from frame 0): frame
    * index, decoded dims, exact integer luma sum. Undecodable frames are
    * skipped — a mixed binary column never fails the task.
    */
  def explodeVideoFrames(df: DataFrame, binCol: String, everyNth: Int): DataFrame = {
    require(everyNth >= 1, s"frame stride must be >= 1, got $everyNth")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType), StructField("frame_w", IntegerType),
      StructField("frame_h", IntegerType), StructField("frame_luma", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        Avi.decode(r.getAs[Array[Byte]](idx)) match {
          case None => Iterator.empty
          case Some(v) =>
            Iterator.range(0, v.nFrames, everyNth).flatMap { f =>
              Avi.frameImage(v, f).map { img =>
                // Seq[Any] pins element types: a bare Seq(int…, long) would
                // unify to Seq[Long] and widen the int fields off-schema
                Row.fromSeq(r.toSeq ++
                  Seq[Any](f, img.getWidth, img.getHeight, lumaSumOf(img)))
              }
            }
        }
      }
    }(enc)
  }

  /** `slots` evenly-spaced frame perceptual hashes per video — the
    * 64-bit-per-slot sketch [[graft.operators.Dedup.hammingVotePairs]]
    * votes over. Slot `s` samples frame `⌊s·n/slots⌋`; videos shorter
    * than `slots` frames repeat frames (still deterministic). Undecodable
    * payloads yield no slots.
    */
  def slotHashes(bytes: Array[Byte], slots: Int): Seq[(Int, Long)] =
    Avi.decode(bytes) match {
      case None => Seq.empty
      case Some(v) if v.nFrames == 0 => Seq.empty
      case Some(v) =>
        (0 until slots).flatMap { s =>
          val f = (s.toLong * v.nFrames / slots).toInt min (v.nFrames - 1)
          Avi.frameImage(v, f).map(img => (s, Multimodal.phashImage(img)))
        }
    }

  /** Deterministic MP4 sample payload byte — pure nonnegative integer
    * arithmetic, EXACTLY mirrored by the m12/m13 oracle SQL.
    */
  def synthMp4Byte(seed: Long, f: Int, i: Int): Int =
    ((seed * 13 + f * 7 + i) % 256).toInt

  /** Minimal-MP4 fixture payload for `seed`, through the real encoder:
    * `nSamples` opaque samples of 100 + (seed+f) % 50 bytes each, chunked
    * 3-per-chunk, keyframe every 2nd — enough table structure that the
    * stsc/stco/stsz resolution path is genuinely exercised.
    */
  def synthMp4Bytes(seed: Long, nSamples: Int, w: Int, h: Int,
      timescale: Long = 1000, sampleDelta: Long = 40): Array[Byte] = {
    val samples = IndexedSeq.tabulate(nSamples) { f =>
      val len = (100 + (seed + f) % 50).toInt
      Array.tabulate[Byte](len)(i => synthMp4Byte(seed, f, i).toByte)
    }
    graft.formats.Mp4.encode(samples, w, h, timescale, sampleDelta)
  }

  /** Deterministic H.264 decoder configuration for `seed` — pure integer
    * arithmetic, EXACTLY mirrored by the m17 oracle SQL: profile cycles
    * Baseline/Main/High (66/77/100), level 3.0–3.3 (30 + seed%4), NAL
    * length framing 4 or 2 bytes, 1–2 SPS of 5+i bytes and 1–3 PPS of
    * 3+i bytes (payload bytes seeded but NOT surfaced by the gate — the
    * Mp4Spec round-trip pins them instead).
    */
  def synthAvcConfig(seed: Long): graft.formats.Mp4.AvcConfig =
    graft.formats.Mp4.AvcConfig(
      profile = Seq(66, 77, 100)((seed % 3).toInt),
      profileCompat = (seed % 2).toInt * 64,
      level = 30 + (seed % 4).toInt,
      nalLengthSize = if (seed % 2 == 0) 4 else 2,
      sps = IndexedSeq.tabulate((1 + seed % 2).toInt)(i =>
        Array.tabulate[Byte](5 + i)(j =>
          (if (j == 0) 0x67 else (seed * 7 + i * 3 + j) % 256).toByte)),
      pps = IndexedSeq.tabulate((1 + seed % 3).toInt)(i =>
        Array.tabulate[Byte](3 + i)(j =>
          (if (j == 0) 0x68 else (seed * 11 + i * 5 + j) % 256).toByte)))

  /** Minimal 'avc1' MP4 for `seed`: AVCC-framed samples (each a sequence
    * of length-prefixed NAL units under the config's `nalLengthSize`)
    * with an avcC decoder-configuration box from [[synthAvcConfig]].
    * Sample f carries 1 + (seed+f)%3 NALs; the first NAL of every even
    * sample is an IDR slice (type 5, matching the encoder's keyEvery=2
    * stss), the rest are non-IDR (type 1); NAL i of sample f has
    * 20 + (seed + f·3 + i) % 10 payload bytes — all mirrored by the m18
    * oracle SQL.
    */
  def synthAvcMp4(seed: Long): Array[Byte] = {
    val cfg = synthAvcConfig(seed)
    val nSamples = (2 + seed % 3).toInt
    val samples = IndexedSeq.tabulate(nSamples) { f =>
      val out = new java.io.ByteArrayOutputStream()
      val nNals = (1 + (seed + f) % 3).toInt
      for (i <- 0 until nNals) {
        val tpe = if (f % 2 == 0 && i == 0) 5 else 1
        val len = (20 + (seed + f * 3 + i) % 10).toInt
        var k = cfg.nalLengthSize
        while (k > 0) { k -= 1; out.write((len >> (8 * k)) & 0xff) }
        out.write(((if (tpe == 5) 3 else 2) << 5) | tpe) // ref_idc | type
        for (j <- 1 until len) out.write(synthMp4Byte(seed, f, i * 31 + j))
      }
      out.toByteArray
    }
    graft.formats.Mp4.encode(samples, 64, 48, 1000, 40, codec = "avc1",
      avcC = Some(cfg))
  }

  /** Variable-frame-rate MP4 fixture: sample f lasts `30 + (seed+f) % 25`
    * media units (timescale 1000 → ms), so the stts runs genuinely vary
    * and a duration-division stand-in would get every timestamp wrong.
    * EXACTLY mirrored by the m16 oracle SQL.
    */
  def synthVfrMp4Bytes(seed: Long, nSamples: Int, w: Int, h: Int): Array[Byte] = {
    val samples = IndexedSeq.tabulate(nSamples) { f =>
      val len = (80 + (seed + f) % 40).toInt
      Array.tabulate[Byte](len)(i => synthMp4Byte(seed, f, i).toByte)
    }
    val deltas = IndexedSeq.tabulate(nSamples)(f => 30L + (seed + f) % 25)
    graft.formats.Mp4.encode(samples, w, h, timescale = 1000, sampleDelta = 40,
      sampleDeltas = deltas)
  }

  /** Audio-only MP4 (M4A) fixture through the real encoder: AAC-shaped
    * timing (delta 1024 at the sample-rate timescale), byte formula
    * EXACTLY mirrored by the m15 oracle SQL.
    */
  def synthM4aBytes(seed: Long, nSamples: Int): Array[Byte] = {
    val samples = IndexedSeq.tabulate(nSamples) { f =>
      val len = (60 + (seed + f) % 30).toInt
      Array.tabulate[Byte](len)(i => ((seed * 11 + f * 5 + i) % 256).toInt.toByte)
    }
    val rate = 8000 << (seed % 3).toInt // 8/16/32 kHz — all divide 1024000
    graft.formats.Mp4.encodeAudio(samples, channels = (1 + seed % 2).toInt,
      sampleRate = rate, timescale = rate, sampleDelta = 1024)
  }

  /** ISO-BMFF metadata probe — box walk only, `mdat` is never read.
    * Appends mp4_brand (string), mp4_ms, mp4_w, mp4_h, mp4_codec
    * (string), mp4_samples, mp4_keyframes (longs); non-MP4 payloads
    * degrade to all-zero/"" rows.
    */
  def withMp4Meta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("mp4_brand", StringType), StructField("mp4_ms", LongType),
      StructField("mp4_w", LongType), StructField("mp4_h", LongType),
      StructField("mp4_codec", StringType), StructField("mp4_samples", LongType),
      StructField("mp4_keyframes", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = graft.formats.Mp4.decode(r.getAs[Array[Byte]](idx)) match {
          case Some(v) =>
            val t = v.videoTracks.headOption
            Seq[Any](v.brand, v.durationMs,
              t.map(_.width.toLong).getOrElse(0L), t.map(_.height.toLong).getOrElse(0L),
              t.map(_.codec).getOrElse(""), t.map(_.nSamples.toLong).getOrElse(0L),
              t.map(_.syncSamples.length.toLong).getOrElse(0L))
          case None => Seq[Any]("", 0L, 0L, 0L, "", 0L, 0L)
        }
        Row.fromSeq(r.toSeq ++ m)
      }
    }(enc)
  }

  /** One row per KEYFRAME sample of the first video track: sample index
    * (0-based), stts-resolved decode time in ms, byte length, exact byte
    * sum — the stss-driven sample walk through stts/stsc/stco/stsz, the
    * container-level "sample the keyframes" operation a training pipeline
    * shards across executors.
    */
  def explodeMp4Keyframes(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("sample_idx", IntegerType), StructField("sample_ts", LongType),
      StructField("sample_len", LongType), StructField("sample_sum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        graft.formats.Mp4.decode(bytes) match {
          case None => Iterator.empty
          case Some(v) =>
            v.videoTracks.headOption.iterator.flatMap { t =>
              t.syncSamples.iterator.flatMap { s1 =>
                val i = (s1 - 1).toInt // stss is 1-based
                graft.formats.Mp4.sampleBytes(bytes, t, i).map { payload =>
                  var sum = 0L
                  payload.foreach(b => sum += b & 0xff)
                  val ts = graft.formats.Mp4.sampleTsMs(t, i).getOrElse(0L)
                  Row.fromSeq(r.toSeq ++ Seq[Any](i, ts, payload.length.toLong, sum))
                }
              }
            }
        }
      }
    }(enc)
  }

  /** One row per sample of the first VIDEO track (keyframe or not) with
    * its stts-resolved decode time — the walk that makes variable-frame-
    * rate timing visible: uniform files get `i·delta`, VFR files get the
    * true cumulative run sums the old duration-division could not produce.
    */
  def explodeMp4Samples(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("sample_idx", IntegerType), StructField("sample_ts", LongType),
      StructField("sample_len", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        graft.formats.Mp4.decode(r.getAs[Array[Byte]](idx)) match {
          case None => Iterator.empty
          case Some(v) =>
            v.videoTracks.headOption.iterator.flatMap { t =>
              Iterator.range(0, t.nSamples).map { i =>
                val ts = graft.formats.Mp4.sampleTs(t, i).getOrElse(0L)
                Row.fromSeq(r.toSeq ++
                  Seq[Any](i, ts, t.sampleSizes(i)))
              }
            }
        }
      }
    }(enc)
  }

  /** One row per sample of the first AUDIO ('soun') track: index, stts
    * decode time in ms, byte length, exact byte sum, plus the
    * AudioSampleEntry channel count and sample rate — the audio leg of
    * the sample walk (audio has no stss; every sample is sync).
    */
  def explodeMp4AudioSamples(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("sample_idx", IntegerType), StructField("sample_ts", LongType),
      StructField("sample_len", LongType), StructField("sample_sum", LongType),
      StructField("audio_channels", IntegerType), StructField("audio_rate", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        graft.formats.Mp4.decode(bytes) match {
          case None => Iterator.empty
          case Some(v) =>
            v.audioTracks.headOption.iterator.flatMap { t =>
              Iterator.range(0, t.nSamples).flatMap { i =>
                graft.formats.Mp4.sampleBytes(bytes, t, i).map { payload =>
                  var sum = 0L
                  payload.foreach(b => sum += b & 0xff)
                  val ts = graft.formats.Mp4.sampleTsMs(t, i).getOrElse(0L)
                  Row.fromSeq(r.toSeq ++ Seq[Any](i, ts, payload.length.toLong,
                    sum, t.channels, t.sampleRate))
                }
              }
            }
        }
      }
    }(enc)
  }

  /** Unified probe over a MIXED media column — real corpora put AVI, MP4,
    * FLAC, MP3, images, and junk in the SAME binary column, and every
    * decoder here is total, so sniffing is just trying them in container
    * order (strong-magic containers first; the MP3 frame-header sniff
    * runs after them because its 11-bit sync is the weakest signature).
    * Appends media_kind ('avi' | 'mp4' | 'wav' | 'flac' | 'mp3' |
    * 'image' | 'unknown') and normalized geometry: media_w/media_h (0
    * for audio), media_frames (1 for still images; MPEG frames for mp3;
    * PCM frames/samples for wav/flac), media_ms (0 where the container
    * has no timing).
    * Header-only for the containers; the image fall-through decodes
    * (ImageIO has no header-only probe and stills dominate neither CPU
    * nor the 100 TB layout decision this column drives).
    */
  def withMediaProbe(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("media_kind", StringType),
      StructField("media_w", LongType), StructField("media_h", LongType),
      StructField("media_frames", LongType), StructField("media_ms", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val m: Seq[Any] = Avi.decode(bytes) match {
          case Some(v) =>
            Seq("avi", v.width.toLong, v.height.toLong, v.nFrames.toLong, v.durationMs)
          case None => graft.formats.Mp4.decode(bytes) match {
            case Some(v) =>
              val t = v.videoTracks.headOption
              Seq("mp4", t.map(_.width.toLong).getOrElse(0L),
                t.map(_.height.toLong).getOrElse(0L),
                t.map(_.nSamples.toLong).getOrElse(0L), v.durationMs)
            case None => graft.formats.Wav.decode(bytes) match {
              case Some(wv) =>
                Seq("wav", 0L, 0L, wv.nFrames.toLong, wv.durationMs)
            case None => graft.formats.Flac.decode(bytes) match {
              case Some(f) =>
                Seq("flac", 0L, 0L, f.totalSamples, f.durationMs)
              case None => graft.formats.Mp3.decode(bytes) match {
                case Some(a) =>
                  Seq("mp3", 0L, 0L, a.nFrames.toLong, a.durationMs)
                case None => Multimodal.decodeImage(bytes) match {
                  case Some((img, _)) =>
                    Seq("image", img.getWidth.toLong, img.getHeight.toLong, 1L, 0L)
                  case None => Seq("unknown", 0L, 0L, 0L, 0L)
                }
              }
            }
          }
        }
        }
        Row.fromSeq(r.toSeq ++ m)
      }
    }(enc)
  }

  /** Near-dup pairs between videos: per-slot frame pHashes voted through
    * the shared Hamming blocking engine. Returns (id_a, id_b, votes,
    * min_hamming) — see [[graft.operators.Dedup.hammingVotePairs]].
    */
  def videoNearDupPairs(df: DataFrame, idCol: String, binCol: String,
      slots: Int = 3, maxHamming: Int = 3, minVotes: Int = 2,
      maxBucketSize: Int = 1000): DataFrame = {
    val hashUdf = udf((b: Array[Byte]) => slotHashes(b, slots))
    val sk = df.select(col(idCol).cast("long").as("id"),
        explode(hashUdf(col(binCol))).as("sl"))
      .select(col("id"), col("sl._1").as("slot"), col("sl._2").as("sh"))
    graft.operators.Dedup.hammingVotePairs(sk, maxHamming, minVotes, maxBucketSize)
  }
}
