package graft.formats

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

import graft.formats.Wav.WavAudio
import graft.pipeline.Audio

class WavSpec extends AnyFunSuite {

  private def tone(n: Int, f: Int => Int): Array[Int] = Array.tabulate(n)(f)

  test("16-bit stereo encode/decode round-trips samples exactly") {
    val l = tone(1000, i => ((i * 37) % 65536) - 32768)
    val r = tone(1000, i => ((i * 91 + 7) % 65536) - 32768)
    val a = WavAudio(16000, 2, 16, Array(l, r))
    val out = Wav.decode(Wav.encode(a)).get
    assert(out.sampleRate == 16000 && out.channels == 2 && out.bitsPerSample == 16)
    assert(out.samples(0).sameElements(l) && out.samples(1).sameElements(r))
  }

  test("8-bit mono encode/decode round-trips (offset-binary storage)") {
    val ch = tone(300, i => (i % 256) - 128)
    val out = Wav.decode(Wav.encode(WavAudio(8000, 1, 8, Array(ch)))).get
    assert(out.bitsPerSample == 8 && out.samples(0).sameElements(ch))
  }

  test("odd-length 8-bit mono encode is RIFF word-aligned (pad byte counted)") {
    val ch = tone(301, i => (i % 256) - 128) // odd data-chunk size
    val bytes = Wav.encode(WavAudio(8000, 1, 8, Array(ch)))
    assert(bytes.length % 2 == 0, "total file length must be even")
    def u32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3).toLong & 0xff) << 24)
    assert(u32(4) == bytes.length - 8, "RIFF size covers the pad byte")
    assert(u32(40) == 301, "data chunk size excludes the pad byte")
    val out = Wav.decode(bytes).get
    assert(out.samples(0).sameElements(ch))
  }

  test("javax.sound.sampled decodes our encoder's output to identical PCM") {
    val ch = tone(777, i => ((i * 131 + 17) % 65536) - 32768)
    val bytes = Wav.encode(WavAudio(22050, 1, 16, Array(ch)))
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 22050f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    val raw = ais.readAllBytes()
    assert(raw.length == 777 * 2)
    val jdk = Array.tabulate(777)(i => (((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort).toInt)
    assert(jdk.sameElements(ch))
  }

  test("our decoder reads javax.sound.sampled's writer output") {
    val ch = tone(500, i => ((i * 211) % 65536) - 32768)
    val raw = new Array[Byte](ch.length * 2)
    for (i <- ch.indices) { raw(2 * i) = ch(i).toByte; raw(2 * i + 1) = (ch(i) >> 8).toByte }
    val fmt = new AudioFormat(11025f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, ch.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val out = Wav.decode(bos.toByteArray).get
    assert(out.sampleRate == 11025 && out.channels == 1 && out.bitsPerSample == 16)
    assert(out.samples(0).sameElements(ch))
  }

  test("decode skips extra chunks (LIST before data) and honours odd-size padding") {
    val base = Wav.encode(WavAudio(8000, 1, 16, Array(tone(10, i => i * 100))))
    // splice a 5-byte (odd) LIST chunk between fmt and data: 5 bytes body +
    // 1 pad byte per RIFF word alignment
    val head = base.take(36)
    val tail = base.drop(36)
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 'I', 'N', 'F', 'O', 'x', 0)
    val spliced = head ++ list ++ tail
    // fix the RIFF size field
    val total = spliced.length - 8
    spliced(4) = total.toByte; spliced(5) = (total >> 8).toByte
    spliced(6) = (total >> 16).toByte; spliced(7) = (total >> 24).toByte
    val out = Wav.decode(spliced).get
    assert(out.samples(0).sameElements(tone(10, i => i * 100)))
  }

  test("decode is total over junk: empty, garbage, truncated, compressed, huge") {
    assert(Wav.decode(null).isEmpty)
    assert(Wav.decode(Array.emptyByteArray).isEmpty)
    assert(Wav.decode(Array.fill[Byte](100)(0x41)).isEmpty)
    val good = Wav.encode(WavAudio(8000, 1, 16, Array(tone(100, _ => 1))))
    assert(Wav.decode(good.take(30)).isEmpty)          // truncated header
    val mulaw = good.clone(); mulaw(20) = 7            // audioFormat = mu-law
    assert(Wav.decode(mulaw).isEmpty)
    val hugeRate = good.clone(); hugeRate(27) = 0x7f   // rate > 384000
    assert(Wav.decode(hugeRate).isEmpty)
    // declared data size beyond the cap but physically truncated: lenient
    // tail decode keeps the complete frames actually present
    val bigDecl = good.clone()
    bigDecl(40) = -1; bigDecl(41) = -1; bigDecl(42) = -1; bigDecl(43) = 0x07
    assert(Wav.decode(bigDecl).get.nFrames == 100)
  }

  test("truncated data chunk decodes the complete frames only") {
    val a = WavAudio(8000, 2, 16, Array(tone(50, i => i), tone(50, i => -i)))
    val cut = Wav.encode(a).dropRight(6) // kills frame 49 and half of 48... 1.5 frames
    val out = Wav.decode(cut).get
    assert(out.nFrames == 48)
    assert(out.samples(0)(47) == 47 && out.samples(1)(47) == -47)
  }

  test("24-bit PCM decodes with sign extension") {
    // hand-build: one frame, sample = -2 (0xFFFFFE little-endian)
    val a = Wav.encode(WavAudio(8000, 1, 16, Array(Array(0)))) // template header
    val b = a.clone()
    b(34) = 24 // bitsPerSample
    b(40) = 3; b(41) = 0; b(42) = 0; b(43) = 0 // data size 3
    val full = b.take(44) ++ Array[Byte](0xfe.toByte, 0xff.toByte, 0xff.toByte)
    // fix RIFF size
    val total = full.length - 8
    full(4) = total.toByte; full(5) = (total >> 8).toByte
    val out = Wav.decode(full).get
    assert(out.bitsPerSample == 24 && out.samples(0).sameElements(Array(-2)))
  }

  test("slice clamps to payload bounds and cuts exact frame ranges") {
    val a = WavAudio(1000, 1, 16, Array(tone(1000, i => i))) // 1 frame per ms
    val s = Wav.slice(a, 100, 250)
    assert(s.nFrames == 150 && s.samples(0)(0) == 100 && s.samples(0)(149) == 249)
    assert(Wav.slice(a, -50, 10).nFrames == 10)
    assert(Wav.slice(a, 900, 5000).nFrames == 100)
    assert(Wav.slice(a, 600, 400).nFrames == 0) // inverted range → empty
  }

  test("decimate keeps every k-th frame and divides the nominal rate") {
    val a = WavAudio(16000, 1, 16, Array(tone(101, i => i)))
    val d = Wav.decimate(a, 4)
    assert(d.sampleRate == 4000 && d.nFrames == 26)
    assert(d.samples(0).take(4).sameElements(Array(0, 4, 8, 12)) && d.samples(0)(25) == 100)
  }

  test("linear resample: identity at same rate, exact midpoints at 2x, ramp preserved") {
    val a = WavAudio(8000, 1, 16, Array(tone(100, i => i * 10)))
    assert(Wav.resampleLinear(a, 8000).samples(0).sameElements(a.samples(0)))
    val up = Wav.resampleLinear(a, 16000)
    assert(up.nFrames == 200)
    assert(up.samples(0)(0) == 0 && up.samples(0)(1) == 5 && up.samples(0)(2) == 10)
    val down = Wav.resampleLinear(a, 4000)
    assert(down.nFrames == 50 && down.samples(0)(7) == 140) // position 7 → source 14
  }

  test("resample duration is preserved within one frame") {
    val a = WavAudio(16000, 1, 16, Array(tone(1600, i => Audio.synthSample(3, i))))
    for (r <- Seq(8000, 22050, 44100)) {
      val out = Wav.resampleLinear(a, r)
      assert(math.abs(out.durationMs - a.durationMs) <= 1, s"rate $r")
    }
  }

  test("synth fixture: silence stripes land exactly on every 4th window") {
    val n = 4 * Audio.WindowFrames
    val seed = 1L // (1 + w) % 4 == 0 → window 3 silent
    val samples = tone(n, i => Audio.synthSample(seed, i))
    val w3 = samples.slice(3 * Audio.WindowFrames, 4 * Audio.WindowFrames)
    assert(w3.forall(_ == 0))
    val w0 = samples.slice(0, Audio.WindowFrames)
    assert(w0.exists(_ != 0))
  }

  test("audio features are integer-exact on a known payload") {
    val bytes = Audio.synthWavBytes(seed = 1, nFrames = 4, sampleRate = 8000)
    // seed 1, window 0 voiced: v(i) = (7919 + 104729·i + (i² % 99991)·31) % 65536 − 32768
    val expect = Array.tabulate(4)(i => Audio.synthSample(1, i))
    val a = Wav.decode(bytes).get
    assert(a.samples(0).sameElements(expect))
    val f = Audio.features(a)
    assert(f._3 == 4 && f._6 == expect.map(v => v.toLong * v).sum)
    val zc = (1 until 4).count(i => (expect(i - 1) < 0) != (expect(i) < 0))
    assert(f._7 == zc)
  }
}
