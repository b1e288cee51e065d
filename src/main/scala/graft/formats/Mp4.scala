package graft.formats

/** ISO Base Media File Format (MP4) container walker (SURVEY §2.9 C2 —
  * the second dominant video container family next to RIFF/AVI
  * ([[Avi]]); builder brief "multimodal metadata" op). Implemented from
  * the public ISO/IEC 14496-12 box structure: big-endian `size|type`
  * boxes (64-bit `largesize` when size==1, to-end-of-file when size==0),
  * container boxes `moov/trak/mdia/minf/stbl`, and the sample tables
  * that make frame-level access possible without any codec:
  *
  *  - `mvhd`/`mdhd` (v0 32-bit / v1 64-bit): movie + media timescale and
  *    duration;
  *  - `tkhd`: track id + 16.16 fixed-point presentation dims;
  *  - `hdlr`: handler ('vide'/'soun');
  *  - `stsd`: codec fourcc of the first sample entry;
  *  - `stsz`: per-sample byte sizes; `stsc`: sample→chunk runs;
  *    `stco`/`co64`: chunk file offsets; `stss`: sync (key) samples;
  *    `stts`: (count, delta) decode-time runs — [[sampleTs]] resolves
  *    per-sample timestamps from them, correct for VFR files;
  *  - audio ('soun') sample entries: channelcount + 16.16 samplerate.
  *
  * [[sampleBytes]] resolves sample i through stsc/stco/stsz to its exact
  * byte extent — the container-level "frame-sample" operation: a cluster
  * job can shard samples across executors and hand the payloads to any
  * decoder. Metadata probes ([[decode]]) never touch `mdat`.
  *
  * Decode is TOTAL: malformed payloads return None (mixed binary columns
  * never fail the task). Same attacker-controlled-size ceilings as the
  * other codecs.
  */
object Mp4 {

  final case class Track(id: Long, handler: String, codec: String,
      width: Int, height: Int, timescale: Long, duration: Long,
      sampleSizes: IndexedSeq[Long],
      // (firstChunk, samplesPerChunk) runs — 1-based firstChunk, as stored
      sampleToChunk: IndexedSeq[(Long, Long)],
      chunkOffsets: IndexedSeq[Long],
      syncSamples: IndexedSeq[Long],
      // stts (count, delta) runs in media-timescale units — the per-sample
      // decode-time table; empty when the file carries no stts
      timeToSample: IndexedSeq[(Long, Long)] = IndexedSeq.empty,
      // audio ('soun') sample-entry fields; 0 for video tracks
      channels: Int = 0, sampleRate: Int = 0,
      // H.264 decoder configuration ('avc1' sample entries); None for
      // other codecs or a malformed avcC box
      avc: Option[AvcConfig] = None) {
    def nSamples: Int = sampleSizes.length
    def durationMs: Long =
      if (timescale <= 0) 0L else duration * 1000L / timescale
  }

  /** AVCDecoderConfigurationRecord essentials (ISO 14496-15 §5.3.3.1,
    * the `avcC` box inside an 'avc1' sample entry): the first thing a
    * video pipeline reads after keyframe byte extents — profile/level
    * decide decoder capability routing, `nalLengthSize` is the framing
    * every AVCC-packed sample uses, and the parameter-set NALs (SPS/PPS)
    * are what a transcoder or bitstream filter re-emits in Annex-B.
    */
  final case class AvcConfig(profile: Int, profileCompat: Int, level: Int,
      nalLengthSize: Int, sps: IndexedSeq[Array[Byte]],
      pps: IndexedSeq[Array[Byte]])

  final case class Mp4File(brand: String, timescale: Long, duration: Long,
      tracks: IndexedSeq[Track]) {
    def durationMs: Long =
      if (timescale <= 0) 0L else duration * 1000L / timescale
    def videoTracks: IndexedSeq[Track] = tracks.filter(_.handler == "vide")
    def audioTracks: IndexedSeq[Track] = tracks.filter(_.handler == "soun")
  }

  private val MaxSamples = 1 << 22  // 4M samples
  private val MaxTracks = 64

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the child boxes of [from, until): calls f(type, bodyFrom,
    * bodyUntil). Returns false on malformed structure.
    */
  private def walk(b: Array[Byte], from: Int, until: Int,
      lenientTail: Boolean = false)
      (f: (String, Int, Int) => Boolean): Boolean = {
    var off = from
    while (off + 8 <= until) {
      val size32 = be32(b, off)
      val tpe = fourcc(b, off + 4)
      var body = off + 8
      val size: Long =
        if (size32 == 1L) {
          if (body + 8 > until) return lenientTail
          val s = be64(b, body); body += 8; s
        } else if (size32 == 0L) (until - off).toLong
        else size32
      if (size < (body - off)) return false
      if (off + size > until) {
        // A final box that overruns the buffer is how crawl-truncated
        // files present (typically a faststart MP4 whose trailing mdat was
        // cut): at the top level, stop the walk and keep what parsed —
        // ftyp/moov metadata must survive a lost tail, matching the
        // lenient-tail AVI/WAV paths. Inside moov the strict path stays:
        // a truncated sample table is structural damage, not a lost tail.
        return lenientTail
      }
      if (!f(tpe, body, (off + size).toInt)) return false
      off = (off + size).toInt
    }
    true
  }

  /** Total MP4 probe. None unless the payload has an `ftyp` and a `moov`
    * with at least one parseable track.
    */
  def decode(bytes: Array[Byte]): Option[Mp4File] = {
    if (bytes == null || bytes.length < 16) return None
    if (be32(bytes, 0) < 8 || fourcc(bytes, 4) != "ftyp") return None
    val brand = fourcc(bytes, 8)

    var timescale = 0L
    var duration = 0L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]

    def parseMvhd(from: Int, until: Int): Boolean = {
      if (from + 4 > until) return false
      val version = bytes(from) & 0xff
      if (version == 1) {
        if (from + 28 > until) return false
        timescale = be32(bytes, from + 20)
        duration = be64(bytes, from + 24)
      } else {
        if (from + 20 > until) return false
        timescale = be32(bytes, from + 12)
        duration = be32(bytes, from + 16)
      }
      true
    }

    def parseTrak(from: Int, until: Int): Boolean = {
      var id = 0L
      var w = 0
      var h = 0
      var handler = ""
      var codec = ""
      var mTimescale = 0L
      var mDuration = 0L
      var sizes: IndexedSeq[Long] = IndexedSeq.empty
      var stsc: IndexedSeq[(Long, Long)] = IndexedSeq.empty
      var stco: IndexedSeq[Long] = IndexedSeq.empty
      var stss: IndexedSeq[Long] = IndexedSeq.empty
      var stts: IndexedSeq[(Long, Long)] = IndexedSeq.empty
      var stsdEntry = -1 // offset of the first sample entry; handler-
      var stsdEnd = -1   // dependent fields decode after the trak walk

      def parseStbl(sf: Int, su: Int): Boolean = walk(bytes, sf, su) {
        case ("stsd", f, u) =>
          // fullbox header + entry_count, then first sample entry:
          // size(4) + format fourcc(4)
          if (f + 16 <= u && be32(bytes, f + 4) >= 1) {
            codec = fourcc(bytes, f + 12)
            stsdEntry = f + 8; stsdEnd = u
          }
          true
        case ("stts", f, u) =>
          if (f + 8 > u) false
          else {
            val n = be32(bytes, f + 4)
            if (f + 8 + 8L * n > u || n > MaxSamples) false
            else {
              stts = IndexedSeq.tabulate(n.toInt)(i =>
                (be32(bytes, f + 8 + 8 * i), be32(bytes, f + 12 + 8 * i)))
              true
            }
          }
        case ("stsz", f, u) =>
          if (f + 12 > u) false
          else {
            val uniform = be32(bytes, f + 4)
            val n = be32(bytes, f + 8)
            if (n > MaxSamples) false
            else if (uniform != 0) { sizes = IndexedSeq.fill(n.toInt)(uniform); true }
            else if (f + 12 + 4L * n > u) false
            else { sizes = IndexedSeq.tabulate(n.toInt)(i => be32(bytes, f + 12 + 4 * i)); true }
          }
        case ("stsc", f, u) =>
          if (f + 8 > u) false
          else {
            val n = be32(bytes, f + 4)
            if (f + 8 + 12L * n > u || n > MaxSamples) false
            else {
              stsc = IndexedSeq.tabulate(n.toInt)(i =>
                (be32(bytes, f + 8 + 12 * i), be32(bytes, f + 12 + 12 * i)))
              true
            }
          }
        case ("stco", f, u) =>
          if (f + 8 > u) false
          else {
            val n = be32(bytes, f + 4)
            if (f + 8 + 4L * n > u || n > MaxSamples) false
            else { stco = IndexedSeq.tabulate(n.toInt)(i => be32(bytes, f + 8 + 4 * i)); true }
          }
        case ("co64", f, u) =>
          if (f + 8 > u) false
          else {
            val n = be32(bytes, f + 4)
            if (f + 8 + 8L * n > u || n > MaxSamples) false
            else { stco = IndexedSeq.tabulate(n.toInt)(i => be64(bytes, f + 8 + 8 * i)); true }
          }
        case ("stss", f, u) =>
          if (f + 8 > u) false
          else {
            val n = be32(bytes, f + 4)
            if (f + 8 + 4L * n > u || n > MaxSamples) false
            else { stss = IndexedSeq.tabulate(n.toInt)(i => be32(bytes, f + 8 + 4 * i)); true }
          }
        case _ => true
      }

      val ok = walk(bytes, from, until) {
        case ("tkhd", f, u) =>
          val version = bytes(f) & 0xff
          // v0: id at +12, dims at +76/+80; v1: id at +20, dims at +88/+92
          val (idOff, dimOff) = if (version == 1) (20, 88) else (12, 76)
          if (f + dimOff + 8 > u) false
          else {
            id = be32(bytes, f + idOff)
            w = (be32(bytes, f + dimOff) >> 16).toInt   // 16.16 fixed
            h = (be32(bytes, f + dimOff + 4) >> 16).toInt
            true
          }
        case ("mdia", f, u) => walk(bytes, f, u) {
          case ("mdhd", mf, mu) =>
            val version = bytes(mf) & 0xff
            if (version == 1) {
              if (mf + 28 > mu) false
              else { mTimescale = be32(bytes, mf + 20); mDuration = be64(bytes, mf + 24); true }
            } else {
              if (mf + 20 > mu) false
              else { mTimescale = be32(bytes, mf + 12); mDuration = be32(bytes, mf + 16); true }
            }
          case ("hdlr", mf, mu) =>
            if (mf + 12 <= mu) handler = fourcc(bytes, mf + 8)
            true
          case ("minf", mf, mu) => walk(bytes, mf, mu) {
            case ("stbl", sf, su) => parseStbl(sf, su)
            case _ => true
          }
          case _ => true
        }
        case _ => true
      }
      if (!ok) return false
      if (tracks.length >= MaxTracks) return false
      // the audio sample entry (ISO 14496-12 AudioSampleEntry) carries
      // channelcount/samplerate at fixed offsets past the shared header;
      // only meaningful once hdlr said 'soun', so decode after the walk
      var channels = 0
      var sampleRate = 0
      if (handler == "soun" && stsdEntry >= 0 && stsdEntry + 36 <= stsdEnd) {
        channels = be16(bytes, stsdEntry + 24)
        sampleRate = (be32(bytes, stsdEntry + 32) >> 16).toInt // 16.16 fixed
      }
      // 'avc1' VisualSampleEntry: 8 (size+fourcc) + 78 fixed fields, then
      // child boxes — scan them for avcC. A malformed record degrades to
      // avc = None, never to a failed track (the container metadata is
      // still good)
      var avc: Option[AvcConfig] = None
      if (handler == "vide" && codec == "avc1" && stsdEntry >= 0 &&
          stsdEntry + 8 <= stsdEnd) {
        val entrySize = be32(bytes, stsdEntry)
        if (entrySize >= 86) {
          val entryEnd = math.min(stsdEnd.toLong, stsdEntry + entrySize).toInt
          if (stsdEntry + 86 <= entryEnd)
            walk(bytes, stsdEntry + 86, entryEnd) {
              case ("avcC", cf, cu) => avc = parseAvcC(bytes, cf, cu); true
              case _ => true
            }
        }
      }
      tracks += Track(id, handler, codec, w, h, mTimescale, mDuration,
        sizes, stsc, stco, stss, stts, channels, sampleRate, avc)
      true
    }

    val ok = walk(bytes, 0, bytes.length, lenientTail = true) {
      case ("moov", f, u) => walk(bytes, f, u) {
        case ("mvhd", mf, mu) => parseMvhd(mf, mu)
        case ("trak", tf, tu) => parseTrak(tf, tu)
        case _ => true
      }
      case _ => true // ftyp, mdat, free, …
    }
    if (!ok || tracks.isEmpty || timescale <= 0) return None
    Some(Mp4File(brand, timescale, duration, tracks.toIndexedSeq))
  }

  /** AVCDecoderConfigurationRecord body at [f, u): version must be 1;
    * the parameter-set loops are bounds-checked step by step so a
    * truncated record yields None rather than a partial config.
    */
  private def parseAvcC(b: Array[Byte], f: Int, u: Int): Option[AvcConfig] = {
    if (f + 7 > u || (b(f) & 0xff) != 1) return None
    val profile = b(f + 1) & 0xff
    val compat = b(f + 2) & 0xff
    val level = b(f + 3) & 0xff
    val nalLen = (b(f + 4) & 0x03) + 1
    var off = f + 5
    def nalSets(count: Int): Option[IndexedSeq[Array[Byte]]] = {
      val out = IndexedSeq.newBuilder[Array[Byte]]
      var i = 0
      while (i < count) {
        if (off + 2 > u) return None
        val len = be16(b, off); off += 2
        if (off + len > u) return None
        out += java.util.Arrays.copyOfRange(b, off, off + len)
        off += len
        i += 1
      }
      Some(out.result())
    }
    val nSps = b(off) & 0x1f; off += 1
    for {
      sps <- nalSets(nSps)
      nPps <- if (off < u) { val n = b(off) & 0xff; off += 1; Some(n) } else None
      pps <- nalSets(nPps)
    } yield AvcConfig(profile, compat, level, nalLen, sps, pps)
  }

  /** Split an AVCC-framed sample payload into its NAL units — the framing
    * `avcC.nalLengthSize` declares (each unit is an N-byte big-endian
    * length prefix + payload; ISO 14496-15 §5.2.3). Returns (nal_type,
    * payload_length) per unit, nal_type = first payload byte & 0x1f
    * (5 = IDR slice, 1 = non-IDR slice, 7/8 = SPS/PPS…). None on
    * inconsistent framing (truncated prefix, zero length, overrun) —
    * a sample either parses completely or not at all, so a downstream
    * keyframe counter can't silently see half a sample.
    */
  def nalUnits(sample: Array[Byte],
      nalLengthSize: Int): Option[IndexedSeq[(Int, Int)]] = {
    if (sample == null || nalLengthSize < 1 || nalLengthSize > 4) return None
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var off = 0
    while (off < sample.length) {
      if (off + nalLengthSize > sample.length) return None
      var len = 0L
      var i = 0
      while (i < nalLengthSize) { len = (len << 8) | (sample(off + i) & 0xff); i += 1 }
      off += nalLengthSize
      if (len < 1 || off + len > sample.length) return None
      out += (((sample(off) & 0x1f), len.toInt))
      off += len.toInt
    }
    Some(out.result())
  }

  /** Byte extent of sample i (0-based) of `t`: resolve the chunk through
    * the stsc runs, then the offset inside the chunk by summing the
    * preceding samples' sizes. None when the tables don't cover i.
    */
  def sampleExtent(t: Track, i: Int): Option[(Long, Long)] = {
    if (i < 0 || i >= t.nSamples || t.sampleToChunk.isEmpty || t.chunkOffsets.isEmpty) return None
    // walk stsc runs: run r covers chunks [firstChunk_r, firstChunk_{r+1})
    var remaining = i
    var r = 0
    while (r < t.sampleToChunk.length) {
      val (first, perChunk) = t.sampleToChunk(r)
      if (perChunk <= 0) return None
      val lastExclusive: Long =
        if (r + 1 < t.sampleToChunk.length) t.sampleToChunk(r + 1)._1
        else Long.MaxValue
      val chunksInRun =
        math.min(lastExclusive - first, t.chunkOffsets.length - (first - 1))
      if (chunksInRun <= 0) return None
      val samplesInRun = chunksInRun * perChunk
      if (remaining < samplesInRun) {
        val chunkIdx = (first - 1 + remaining / perChunk).toInt
        if (chunkIdx >= t.chunkOffsets.length) return None
        val firstSampleOfChunk = i - (remaining % perChunk).toInt
        var off = t.chunkOffsets(chunkIdx)
        var s = firstSampleOfChunk
        while (s < i) { off += t.sampleSizes(s); s += 1 }
        return Some((off, t.sampleSizes(i)))
      }
      remaining -= samplesInRun.toInt
      r += 1
    }
    None
  }

  /** Decode time of sample i (0-based) in media-timescale units, resolved
    * through the stts (count, delta) runs — the authoritative per-sample
    * clock, correct for variable-frame-rate files where the old
    * mdhd-duration division was not. Files with no stts fall back to the
    * uniform mdhd-derived spacing. None when i is out of range or the
    * runs don't cover it.
    */
  def sampleTs(t: Track, i: Int): Option[Long] = {
    if (i < 0 || i >= t.nSamples) return None
    if (t.timeToSample.isEmpty)
      return Some(if (t.nSamples == 0) 0L else t.duration * i / t.nSamples)
    var acc = 0L
    var rem = i.toLong
    var r = 0
    while (r < t.timeToSample.length) {
      val (count, delta) = t.timeToSample(r)
      if (count < 0 || delta < 0) return None
      if (rem < count) return Some(acc + rem * delta)
      acc += count * delta
      rem -= count
      r += 1
    }
    None
  }

  /** [[sampleTs]] converted to milliseconds via the track timescale. */
  def sampleTsMs(t: Track, i: Int): Option[Long] =
    sampleTs(t, i).map(ts => if (t.timescale <= 0) 0L else ts * 1000L / t.timescale)

  /** The bytes of sample i — the container-level frame fetch. */
  def sampleBytes(bytes: Array[Byte], t: Track, i: Int): Option[Array[Byte]] =
    sampleExtent(t, i).flatMap { case (off, len) =>
      if (off < 0 || len < 0 || off + len > bytes.length) None
      else Some(java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt))
    }

  /** Minimal valid encode for fixtures and round-trip tests: `ftyp` +
    * `mdat` (samples concatenated, `chunkSize` samples per chunk) +
    * `moov` with one video track carrying real stsd/stts/stsz/stsc/stco
    * (+stss marking every `keyEvery`-th sample). Timescale/duration in
    * movie units; dims in 16.16 fixed. `sampleDeltas` (when non-empty,
    * one entry per sample) writes a run-length-encoded stts — the
    * variable-frame-rate case [[sampleTs]] resolves; otherwise every
    * sample gets the uniform `sampleDelta`.
    */
  def encode(samples: IndexedSeq[Array[Byte]], width: Int, height: Int,
      timescale: Long, sampleDelta: Long, codec: String = "mp4v",
      chunkSize: Int = 3, keyEvery: Int = 2,
      sampleDeltas: IndexedSeq[Long] = IndexedSeq.empty,
      avcC: Option[AvcConfig] = None): Array[Byte] = {
    require(width >= 0 && height >= 0 && timescale >= 1 && sampleDelta >= 1)
    require(chunkSize >= 1 && keyEvery >= 1 && codec.length == 4)
    require(sampleDeltas.isEmpty || sampleDeltas.length == samples.length,
      s"sampleDeltas must be empty or per-sample")
    // avcC field widths (ISO 14496-15 §5.2.4.1): sps count is 5 bits
    // (written as 0xe0|count — an oversized count would silently wrap into
    // the reserved bits), pps count 8 bits, each parameter-set length 16
    // bits, nal length size 1-4. Fail fast like the dimension requires.
    avcC.foreach { c =>
      require(c.nalLengthSize >= 1 && c.nalLengthSize <= 4,
        s"avcC nalLengthSize must be 1-4: ${c.nalLengthSize}")
      require(c.sps.length <= 31 && c.pps.length <= 255,
        s"avcC supports <=31 SPS / <=255 PPS: ${c.sps.length}/${c.pps.length}")
      require((c.sps ++ c.pps).forall(_.length <= 0xffff),
        "avcC parameter-set lengths must fit 16 bits")
    }
    val deltas =
      if (sampleDeltas.nonEmpty) sampleDeltas
      else IndexedSeq.fill(samples.length)(sampleDelta)
    val out = new java.io.ByteArrayOutputStream()
    def p8(x: Int): Unit = out.write(x & 0xff)
    def p16(x: Int): Unit = { p8(x >> 8); p8(x) }
    def p32(x: Long): Unit = { p16((x >> 16).toInt); p16(x.toInt) }
    def fcc(s: String): Unit = { require(s.length == 4); s.foreach(c => p8(c.toInt)) }
    def box(tpe: String)(body: => Unit): Unit = {
      val sizeAt = out.size()
      p32(0); fcc(tpe)
      body
      val end = out.size()
      val arr = out.toByteArray // patch the size in place
      val size = end - sizeAt
      arr(sizeAt) = ((size >> 24) & 0xff).toByte
      arr(sizeAt + 1) = ((size >> 16) & 0xff).toByte
      arr(sizeAt + 2) = ((size >> 8) & 0xff).toByte
      arr(sizeAt + 3) = (size & 0xff).toByte
      out.reset(); out.write(arr, 0, arr.length)
    }

    box("ftyp") { fcc("isom"); p32(512); fcc("isom"); fcc("iso2") }
    val mdatHeader = out.size()
    // chunk offsets are known up front: mdat body starts after its header
    val nChunks = (samples.length + chunkSize - 1) / chunkSize
    val chunkOff = new Array[Long](nChunks)
    var acc = mdatHeader + 8L
    var ci = 0
    var si = 0
    while (si < samples.length) {
      if (si % chunkSize == 0) { chunkOff(ci) = acc; ci += 1 }
      acc += samples(si).length
      si += 1
    }
    box("mdat") { samples.foreach(s => out.write(s)) }

    val duration = deltas.sum
    // RLE the per-sample deltas into stts (count, delta) runs
    val sttsRuns = {
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      deltas.foreach { d =>
        if (runs.nonEmpty && runs.last._2 == d)
          runs(runs.length - 1) = (runs.last._1 + 1, d)
        else runs += ((1L, d))
      }
      runs.toIndexedSeq
    }
    box("moov") {
      box("mvhd") {
        p32(0) // version+flags
        p32(0); p32(0) // times
        p32(timescale); p32(duration)
        p32(0x00010000L); p16(0x0100); p16(0) // rate, volume, reserved
        p32(0); p32(0)
        // unity matrix
        p32(0x00010000L); p32(0); p32(0)
        p32(0); p32(0x00010000L); p32(0)
        p32(0); p32(0); p32(0x40000000L)
        (0 until 6).foreach(_ => p32(0)) // pre_defined
        p32(2) // next track id
      }
      box("trak") {
        box("tkhd") {
          p32(7) // version 0, flags: enabled+in-movie+in-preview
          p32(0); p32(0)
          p32(1) // track id
          p32(0)
          p32(duration)
          p32(0); p32(0)
          p16(0); p16(0); p16(0); p16(0) // layer, group, volume, reserved
          p32(0x00010000L); p32(0); p32(0)
          p32(0); p32(0x00010000L); p32(0)
          p32(0); p32(0); p32(0x40000000L)
          p32(width.toLong << 16); p32(height.toLong << 16)
        }
        box("mdia") {
          box("mdhd") {
            p32(0)
            p32(0); p32(0)
            p32(timescale); p32(duration)
            p16(0x55c4); p16(0) // und language, pre_defined
          }
          box("hdlr") {
            p32(0); p32(0)
            fcc("vide")
            p32(0); p32(0); p32(0)
            p8(0) // empty name, null-terminated
          }
          box("minf") {
            box("vmhd") { p32(1); p16(0); p16(0); p16(0); p16(0) }
            box("stbl") {
              box("stsd") {
                p32(0); p32(1) // one entry
                box(codec) {
                  (0 until 6).foreach(_ => p8(0)); p16(1) // reserved, dref idx
                  p16(0); p16(0); p32(0); p32(0); p32(0)  // pre/reserved
                  p16(width); p16(height)
                  p32(0x00480000L); p32(0x00480000L) // 72 dpi
                  p32(0); p16(1) // frame count
                  (0 until 32).foreach(_ => p8(0)) // compressor name
                  p16(24); p16(0xffff) // depth, pre_defined
                  // optional AVCDecoderConfigurationRecord child box —
                  // callers pass it with codec = "avc1"
                  avcC.foreach { c =>
                    box("avcC") {
                      p8(1); p8(c.profile); p8(c.profileCompat); p8(c.level)
                      p8(0xfc | (c.nalLengthSize - 1))
                      p8(0xe0 | c.sps.length)
                      c.sps.foreach { s =>
                        p16(s.length); s.foreach(x => p8(x.toInt)) }
                      p8(c.pps.length)
                      c.pps.foreach { s =>
                        p16(s.length); s.foreach(x => p8(x.toInt)) }
                    }
                  }
                }
              }
              box("stts") {
                p32(0); p32(sttsRuns.length)
                sttsRuns.foreach { case (c, dl) => p32(c); p32(dl) }
              }
              box("stss") {
                val keys = (1 to samples.length).filter(s => (s - 1) % keyEvery == 0)
                p32(0); p32(keys.length); keys.foreach(k => p32(k))
              }
              box("stsc") {
                // one run if uniform; a closing short run otherwise
                val full = samples.length / chunkSize
                val rem = samples.length % chunkSize
                if (rem == 0 || full == 0) {
                  p32(0); p32(1)
                  p32(1); p32(if (full == 0) rem else chunkSize); p32(1)
                } else {
                  p32(0); p32(2)
                  p32(1); p32(chunkSize); p32(1)
                  p32(full + 1); p32(rem); p32(1)
                }
              }
              box("stsz") {
                p32(0); p32(0); p32(samples.length)
                samples.foreach(s => p32(s.length))
              }
              box("stco") { p32(0); p32(nChunks); chunkOff.foreach(o => p32(o)) }
            }
          }
        }
      }
    }
    out.toByteArray
  }

  /** Audio-only encode ('soun' handler, `smhd`, an ISO 14496-12
    * AudioSampleEntry carrying channelcount + 16.16 samplerate): the
    * fixture for the audio-track sample walk. Audio samples are all sync,
    * so no `stss` is written; timing is one uniform stts run of
    * `sampleDelta` media units per sample (e.g. 1024 for AAC frames).
    */
  def encodeAudio(samples: IndexedSeq[Array[Byte]], channels: Int,
      sampleRate: Int, timescale: Long, sampleDelta: Long,
      codec: String = "mp4a", chunkSize: Int = 3): Array[Byte] = {
    require(channels >= 1 && sampleRate >= 1 && timescale >= 1 && sampleDelta >= 1)
    require(chunkSize >= 1 && codec.length == 4)
    val out = new java.io.ByteArrayOutputStream()
    def p8(x: Int): Unit = out.write(x & 0xff)
    def p16(x: Int): Unit = { p8(x >> 8); p8(x) }
    def p32(x: Long): Unit = { p16((x >> 16).toInt); p16(x.toInt) }
    def fcc(s: String): Unit = { require(s.length == 4); s.foreach(c => p8(c.toInt)) }
    def box(tpe: String)(body: => Unit): Unit = {
      val sizeAt = out.size()
      p32(0); fcc(tpe)
      body
      val arr = out.toByteArray
      val size = arr.length - sizeAt
      arr(sizeAt) = ((size >> 24) & 0xff).toByte
      arr(sizeAt + 1) = ((size >> 16) & 0xff).toByte
      arr(sizeAt + 2) = ((size >> 8) & 0xff).toByte
      arr(sizeAt + 3) = (size & 0xff).toByte
      out.reset(); out.write(arr, 0, arr.length)
    }

    box("ftyp") { fcc("M4A "); p32(512); fcc("isom"); fcc("iso2") }
    val mdatHeader = out.size()
    val nChunks = (samples.length + chunkSize - 1) / chunkSize
    val chunkOff = new Array[Long](nChunks)
    var acc = mdatHeader + 8L
    var ci = 0
    var si = 0
    while (si < samples.length) {
      if (si % chunkSize == 0) { chunkOff(ci) = acc; ci += 1 }
      acc += samples(si).length
      si += 1
    }
    box("mdat") { samples.foreach(s => out.write(s)) }

    val duration = samples.length * sampleDelta
    box("moov") {
      box("mvhd") {
        p32(0)
        p32(0); p32(0)
        p32(timescale); p32(duration)
        p32(0x00010000L); p16(0x0100); p16(0)
        p32(0); p32(0)
        p32(0x00010000L); p32(0); p32(0)
        p32(0); p32(0x00010000L); p32(0)
        p32(0); p32(0); p32(0x40000000L)
        (0 until 6).foreach(_ => p32(0))
        p32(2)
      }
      box("trak") {
        box("tkhd") {
          p32(7)
          p32(0); p32(0)
          p32(1)
          p32(0)
          p32(duration)
          p32(0); p32(0)
          p16(0); p16(0); p16(0x0100); p16(0) // layer, group, volume=1.0
          p32(0x00010000L); p32(0); p32(0)
          p32(0); p32(0x00010000L); p32(0)
          p32(0); p32(0); p32(0x40000000L)
          p32(0); p32(0) // audio: zero presentation dims
        }
        box("mdia") {
          box("mdhd") {
            p32(0)
            p32(0); p32(0)
            p32(timescale); p32(duration)
            p16(0x55c4); p16(0)
          }
          box("hdlr") {
            p32(0); p32(0)
            fcc("soun")
            p32(0); p32(0); p32(0)
            p8(0)
          }
          box("minf") {
            box("smhd") { p32(0); p16(0); p16(0) } // balance, reserved
            box("stbl") {
              box("stsd") {
                p32(0); p32(1)
                box(codec) {
                  (0 until 6).foreach(_ => p8(0)); p16(1) // reserved, dref idx
                  p16(0); p16(0); p32(0)      // version, revision, vendor
                  p16(channels); p16(16)      // channelcount, samplesize
                  p16(0); p16(0)              // pre_defined, reserved
                  p32(sampleRate.toLong << 16) // 16.16 fixed
                }
              }
              box("stts") { p32(0); p32(1); p32(samples.length); p32(sampleDelta) }
              box("stsc") {
                val full = samples.length / chunkSize
                val rem = samples.length % chunkSize
                if (rem == 0 || full == 0) {
                  p32(0); p32(1)
                  p32(1); p32(if (full == 0) rem else chunkSize); p32(1)
                } else {
                  p32(0); p32(2)
                  p32(1); p32(chunkSize); p32(1)
                  p32(full + 1); p32(rem); p32(1)
                }
              }
              box("stsz") {
                p32(0); p32(0); p32(samples.length)
                samples.foreach(s => p32(s.length))
              }
              box("stco") { p32(0); p32(nChunks); chunkOff.foreach(o => p32(o)) }
            }
          }
        }
      }
    }
    out.toByteArray
  }
}
