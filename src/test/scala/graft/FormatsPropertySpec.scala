package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.core.{Bpe, BpeTokenizer, Charsets}
import graft.formats.{Ooxml, Pdf}

/** Property-based invariants for the round-4 surface: charset detection,
  * the binary container round-trips, and BPE losslessness — arbitrary
  * inputs the fixed gate fixtures cannot cover.
  */
class FormatsPropertySpec extends AnyFunSuite {

  private def forAll[A](ga: Gen[A])(body: A => Unit): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100),
      Prop.forAllNoShrink(ga) { a => body(a); true })
    assert(res.passed, res.status.toString)
  }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(1, 80)
    chars <- Gen.listOfN(n, Gen.frequency(
      (20, Gen.alphaNumChar),
      (5, Gen.const(' ')),
      (2, Gen.oneOf('é', 'ü', 'ß', '日', '本', 'ø')),
      (2, Gen.oneOf('.', ',', '!', '-', '(', ')', '\\'))))
  } yield chars.mkString

  test("charset: any detected decode of UTF-8 text round-trips") {
    forAll(textGen) { s =>
      val bytes = s.getBytes("UTF-8")
      val (decoded, cs) = Charsets.decodeDetected(bytes)
      assert(decoded == s, s"[$cs] mangled $s")
    }
  }

  test("charset: detect never throws on arbitrary bytes and always decodes") {
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) { b =>
      val (decoded, cs) = Charsets.decodeDetected(b)
      assert(decoded != null && cs.nonEmpty)
    }
  }

  test("pdf: arbitrary text lines survive write → extract, both filters") {
    // writePdf emits simple-font Latin-1 text — constrain the alphabet
    val lineGen = textGen.map(_.replace("\r", " ").replace("\n", " ")
      .map(c => if (c > 0xFF) 'x' else c))
    forAll(Gen.nonEmptyListOf(lineGen).map(_.take(8))) { lines =>
      val trimmed = lines // writer emits one Td-separated line each
      for (compress <- Seq(true, false)) {
        val got = Pdf.extractText(Pdf.writePdf(trimmed, compress))
        assert(got == trimmed.mkString("\n"), s"compress=$compress")
      }
    }
  }

  test("docx: arbitrary paragraphs survive write → read") {
    val para = textGen.map(_.replace("\r", " ").replace("\n", " ").replace("\t", " "))
    forAll(Gen.nonEmptyListOf(para).map(_.take(10))) { paras =>
      assert(Ooxml.readDocxParagraphs(Ooxml.writeDocx(paras)) == paras)
    }
  }

  test("docx/pptx: arbitrary paragraph+table block sequences survive write → read") {
    val cellText = textGen.map(_.take(12).replace("\r", " "))
    val tableGen: Gen[Ooxml.DocTable] = for {
      cols <- Gen.choose(1, 4)
      nRows <- Gen.choose(1, 5)
      rows <- Gen.listOfN(nRows, Gen.listOfN(cols, cellText))
    } yield Ooxml.DocTable(rows.map(_.toSeq))
    val paraGen: Gen[Ooxml.DocBlock] =
      textGen.map(t => Ooxml.DocPara(t.replace("\r", " ").replace("\n", " ").replace("\t", " ")))
    val blockGen: Gen[Ooxml.DocBlock] =
      Gen.frequency((3, paraGen), (2, tableGen.map(t => t: Ooxml.DocBlock)))
    val blocksGen = Gen.nonEmptyListOf(blockGen).map(_.take(8))
    forAll(blocksGen) { blocks =>
      assert(Ooxml.readDocxBlocks(Ooxml.writeDocxBlocks(blocks)) == blocks)
      assert(Ooxml.readPptxSlideBlocks(Ooxml.writePptxBlocks(Seq(blocks))) ==
        Seq(blocks))
    }
  }

  test("xlsx: arbitrary cell grids survive write → read modulo trailing blanks") {
    val cell = Gen.frequency(
      (6, textGen.map(_.take(12))),
      (2, Gen.choose(-9999, 9999).map(_.toString)),
      (1, Gen.const("")))
    val row = Gen.listOfN(4, cell)
    forAll(Gen.nonEmptyListOf(row).map(_.take(6))) { rows =>
      val sheet = Ooxml.XlsxSheet("P", rows.map(_.toSeq))
      val back = Ooxml.readXlsx(Ooxml.writeXlsx(Seq(sheet))).head.rows
      assert(back.length == rows.length)
      back.zip(rows).foreach { case (got, want) =>
        // the writer omits empty cells; the reader pads interior gaps but
        // cannot know about trailing blanks — compare right-trimmed
        val wantTrim = want.reverse.dropWhile(_.isEmpty).reverse
        assert(got == wantTrim, s"want=$want got=$got")
      }
    }
  }

  test("avi: arbitrary DIB frame geometry round-trips pixel-exactly") {
    import graft.formats.Avi
    val geom = for {
      w <- Gen.choose(1, 24); h <- Gen.choose(1, 16)
      n <- Gen.choose(0, 6); seed <- Gen.choose(0L, 1L << 40)
    } yield (w, h, n, seed)
    forAll(geom) { case (w, h, n, seed) =>
      val bytes = graft.pipeline.Video.synthAviBytes(seed, n, w, h)
      val v = Avi.decode(bytes).get
      assert(v.width == w && v.height == h && v.nFrames == n)
      (0 until n).foreach { f =>
        val img = Avi.frameImage(v, f).get
        // spot-check corners + center (full grids are covered by AviSpec)
        for ((x, y) <- Seq((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1), (w / 2, h / 2)))
          assert((img.getRGB(x, y) & 0xffffff) ==
            graft.pipeline.Video.synthRgb(seed, f, x, y))
      }
    }
  }

  test("avi/mp4: random mutations of valid containers never throw") {
    import graft.formats.{Avi, Mp4}
    val avi = graft.pipeline.Video.synthAviBytes(5L, 3, 8, 8)
    val mp4 = graft.pipeline.Video.synthMp4Bytes(5L, 6, 32, 32)
    val mut = for {
      which <- Gen.oneOf(0, 1)
      base = if (which == 0) avi else mp4
      nFlips <- Gen.choose(1, 8)
      flips <- Gen.listOfN(nFlips,
        Gen.zip(Gen.choose(0, base.length - 1), Gen.choose(Byte.MinValue, Byte.MaxValue)))
      cut <- Gen.choose(0, base.length)
    } yield (which, flips, cut)
    forAll(mut) { case (which, flips, cut) =>
      val base = (if (which == 0) avi else mp4).clone()
      flips.foreach { case (i, b) => base(i) = b }
      val mutated = base.take(cut)
      if (which == 0) {
        Avi.decode(mutated).foreach { v =>     // decode may succeed or not —
          (0 until v.nFrames).foreach(Avi.frameImage(v, _)) // but never throw
        }
      } else {
        Mp4.decode(mutated).foreach { m =>
          m.tracks.foreach { t =>
            (0 until math.min(t.nSamples, 8)).foreach(Mp4.sampleBytes(mutated, t, _))
          }
        }
      }
    }
  }

  test("flac/mp3: random mutations of valid audio headers never throw") {
    import graft.formats.{Flac, Mp3}
    val flac = Flac.encode(Flac.FlacInfo(44100, 2, 16, 441000))
    val mp3 = Mp3.encode(4, 1, 2, 9, mono = true, seed = 5L, id3Bytes = 12)
    val mut = for {
      which <- Gen.oneOf(0, 1)
      base = if (which == 0) flac else mp3
      nFlips <- Gen.choose(1, 8)
      flips <- Gen.listOfN(nFlips,
        Gen.zip(Gen.choose(0, base.length - 1), Gen.choose(Byte.MinValue, Byte.MaxValue)))
      cut <- Gen.choose(0, base.length)
    } yield (which, flips, cut)
    forAll(mut) { case (which, flips, cut) =>
      val base = (if (which == 0) flac else mp3).clone()
      flips.foreach { case (i, b) => base(i) = b }
      val mutated = base.take(cut)
      // decode may succeed or not — but never throws, and any reported
      // geometry is internally consistent
      if (which == 0) Flac.decode(mutated).foreach { f =>
        assert(f.sampleRate > 0 && f.channels >= 1 && f.durationMs >= 0)
      } else Mp3.decode(mutated).foreach { m =>
        assert(m.nFrames >= 0 && m.sampleRate > 0 && m.durationMs >= 0)
      }
    }
  }

  test("mp3: arbitrary CBR parameter grids round-trip the frame count") {
    import graft.formats.Mp3
    val gen = for {
      n <- Gen.choose(1, 20)
      v <- Gen.oneOf(1, 2)
      rateIdx <- Gen.choose(0, 2)
      brIdx <- Gen.choose(1, 14)
      mono <- Gen.oneOf(true, false)
      id3 <- Gen.oneOf(0, 1, 40)
    } yield (n, v, rateIdx, brIdx, mono, id3)
    forAll(gen) { case (n, v, rateIdx, brIdx, mono, id3) =>
      val d = Mp3.decode(Mp3.encode(n, v, rateIdx, brIdx, mono, seed = 3L,
        id3Bytes = id3)).get
      assert(d.nFrames == n && d.mpegVersion == v)
      assert(d.channels == (if (mono) 1 else 2))
    }
  }

  test("mp4: arbitrary sample sizes and chunkings resolve every extent") {
    import graft.formats.Mp4
    val gen = for {
      n <- Gen.choose(1, 12)
      sizes <- Gen.listOfN(n, Gen.choose(1, 64))
      chunk <- Gen.choose(1, 5)
      key <- Gen.choose(1, 4)
    } yield (sizes, chunk, key)
    forAll(gen) { case (sizes, chunk, key) =>
      val samples = sizes.zipWithIndex.map { case (len, f) =>
        Array.tabulate[Byte](len)(i => ((f * 31 + i) % 256).toByte)
      }.toIndexedSeq
      val bytes = Mp4.encode(samples, 16, 16, 1000, 40, chunkSize = chunk, keyEvery = key)
      val t = Mp4.decode(bytes).get.videoTracks.head
      assert(t.nSamples == samples.length)
      samples.indices.foreach { i =>
        assert(Mp4.sampleBytes(bytes, t, i).get.sameElements(samples(i)),
          s"sample $i of ${samples.length} chunk=$chunk")
      }
      assert(t.syncSamples == (1 to samples.length).filter(s => (s - 1) % key == 0).map(_.toLong))
    }
  }

  test("avcC: arbitrary decoder configurations round-trip through avc1") {
    import graft.formats.Mp4
    val nalGen = for {
      n <- Gen.choose(1, 6)
      first <- Gen.choose(0, 255)
      rest <- Gen.listOfN(n - 1, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (first.toByte +: rest).toArray
    val cfgGen = for {
      profile <- Gen.oneOf(66, 77, 100, 244)
      compat <- Gen.choose(0, 255)
      level <- Gen.choose(10, 62)
      nls <- Gen.oneOf(1, 2, 4)
      sps <- Gen.choose(1, 5).flatMap(k => Gen.listOfN(k, nalGen))
      pps <- Gen.choose(0, 4).flatMap(k => Gen.listOfN(k, nalGen))
    } yield Mp4.AvcConfig(profile, compat, level, nls,
      sps.toIndexedSeq, pps.toIndexedSeq)
    val samples = IndexedSeq(Array.tabulate[Byte](24)(_.toByte))
    forAll(cfgGen) { cfg =>
      val bytes = Mp4.encode(samples, 16, 16, 1000, 40, codec = "avc1",
        avcC = Some(cfg))
      val a = Mp4.decode(bytes).get.videoTracks.head.avc.get
      assert(a.profile == cfg.profile && a.profileCompat == cfg.profileCompat)
      assert(a.level == cfg.level && a.nalLengthSize == cfg.nalLengthSize)
      assert(a.sps.length == cfg.sps.length && a.pps.length == cfg.pps.length)
      (a.sps zip cfg.sps).foreach { case (x, y) => assert(x.sameElements(y)) }
      (a.pps zip cfg.pps).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
  }

  test("nalUnits: arbitrary framed NAL sequences round-trip; mutations never throw") {
    import graft.formats.Mp4
    val gen = for {
      nls <- Gen.oneOf(1, 2, 3, 4)
      units <- Gen.choose(0, 6).flatMap(k => Gen.listOfN(k, for {
        tpe <- Gen.choose(0, 31)
        len <- Gen.choose(1, if (nls == 1) 200 else 400)
        body <- Gen.listOfN(len - 1, Gen.choose(Byte.MinValue, Byte.MaxValue))
      } yield (tpe, (((tpe | 0x60) & 0xff).toByte +: body).toArray)))
      flip <- Gen.choose(0, 1 << 20)
    } yield (nls, units, flip)
    forAll(gen) { case (nls, units, flip) =>
      val out = new java.io.ByteArrayOutputStream()
      units.foreach { case (_, payload) =>
        var k = nls
        while (k > 0) { k -= 1; out.write((payload.length >> (8 * k)) & 0xff) }
        out.write(payload)
      }
      val framed = out.toByteArray
      val parsed = Mp4.nalUnits(framed, nls)
      assert(parsed.contains(units.map { case (_, p) =>
        ((p(0) & 0x1f), p.length) }.toIndexedSeq))
      // a random byte mutation may or may not stay parseable, but must
      // never throw, and every parsed unit must still fit the buffer
      if (framed.nonEmpty) {
        val m = framed.clone(); m(flip % m.length) = (flip >> 8).toByte
        Mp4.nalUnits(m, nls).foreach(us =>
          assert(us.map(_._2 + nls).sum == m.length))
      }
    }
  }

  test("bpe: encoding is lossless for any trained table and any input") {
    val corpusCounts = Seq("the quick brown fox", "lazy dogs sleep all day")
      .flatMap(Bpe.preTokens).groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val tok = new BpeTokenizer(Bpe.train(corpusCounts, 40))
    forAll(textGen) { s =>
      val toks = tok.tokens(s)
      if (s.nonEmpty) {
        val bytes = toks.map(_.getBytes("ISO-8859-1")).foldLeft(Array.empty[Byte])(_ ++ _)
        assert(new String(bytes, "UTF-8") == s, s"lossy: $s")
        assert(tok.count(s) == toks.length)
      }
    }
  }
}
