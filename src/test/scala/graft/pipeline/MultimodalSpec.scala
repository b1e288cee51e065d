package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.services.LeadingSentencesSummarizer

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("shoelace polygon area: rectangle, triangle, degenerate (X13)") {
    val rect = Seq(0.0, 0.0, 4.0, 0.0, 4.0, 3.0, 0.0, 3.0)
    assert(Multimodal.polygonArea(rect) == 12.0)
    val tri = Seq(0.0, 0.0, 4.0, 0.0, 0.0, 3.0)
    assert(Multimodal.polygonArea(tri) == 6.0)
    assert(Multimodal.polygonArea(Seq(1.0, 2.0)) == 0.0)
    assert(Multimodal.figureAreaPct(rect, 20, 20) == 3.0)
  }

  test("figure area filter drops sub-threshold figures (F8)") {
    import spark.implicits._
    val figs = Seq(
      ("f1", 1, Seq(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0), 20.0, 20.0), // 25%
      ("f2", 1, Seq(0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 2.0), 20.0, 20.0)      // 1%
    ).toDF("figure_id", "page", "polygon", "page_width", "page_height")
    val kept = Multimodal.filterSmallFigures(figs, minAreaPct = 4.0).collect()
    assert(kept.map(_.getString(0)).toSeq == Seq("f1"))
  }

  test("real PNG decode: exact dims, pixel round-trip, luma sum (C2)") {
    // a programmatically generated PNG must decode back to its exact
    // pixels: dims, per-pixel values, the 16-bin histogram, and the luma sum
    val png = Multimodal.synthPng(23, 17, seed = 42L)
    // PNG magic bytes prove a real container, not a synthetic buffer
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte && png(2) == 'N'.toByte)
    val (w, h, fmt, feats, lsum) = Multimodal.decode(png)
    assert((w, h, fmt) == (23, 17, "png"))
    // recompute the expected luma sum + histogram from the pixel formula
    var expSum = 0L
    val expHist = new Array[Long](16)
    for (y <- 0 until 17; x <- 0 until 23) {
      val g = ((42L * 31 + x * 7 + y * 13) % 256).toInt
      expSum += g
      expHist(g >> 4) += 1
    }
    assert(lsum == expSum, "decoded luma sum must equal the formula sum")
    val norm = math.sqrt(expHist.map(c => c.toDouble * c).sum)
    (0 until 16).foreach { b =>
      assert(math.abs(feats(b) - expHist(b) / norm) < 1e-5,
        s"histogram bin $b diverges from decoded pixels")
    }
    // the decoded image itself carries the formula pixels
    val img = Multimodal.decodeImage(png).get._1
    assert(img.getRaster.getSample(5, 3, 0) == ((42L * 31 + 5 * 7 + 3 * 13) % 256).toInt)
  }

  test("non-image payloads degrade to a rasterless byte histogram") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "")).toDF("id", "text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val out = Multimodal.withMediaFeatures(df, "payload").collect()
    assert(out.length == 2)
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getAs[String]("media_format") == "raw")
    assert(r1.getAs[Int]("media_width") == 0 && r1.getAs[Int]("media_height") == 0)
    assert(r1.getAs[Long]("media_luma") == 0L)
    val feats = r1.getAs[scala.collection.Seq[Float]]("media_features")
    assert(feats.length == 16)
    val norm = math.sqrt(feats.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // deterministic
    val again = Multimodal.withMediaFeatures(df, "payload").collect()
      .find(_.getLong(0) == 1L).get.getAs[scala.collection.Seq[Float]]("media_features")
    assert(again == feats)
    assert(out.find(_.getLong(0) == 2L).get.getAs[String]("media_format") == "empty")
  }

  test("decode is total over adversarial payloads: corrupt bodies and runaway dims") {
    // valid PNG magic + garbage body: the PNG reader claims it, then throws
    // an unchecked exception mid-decode — must be None, not a task failure
    val good = Multimodal.synthPng(16, 16, seed = 3L)
    val corrupt = good.take(24) ++ Array.fill[Byte](40)(0x5a)
    assert(Multimodal.decodeImage(corrupt).isEmpty)
    // truncated mid-stream
    assert(Multimodal.decodeImage(good.take(good.length / 2)).isEmpty)
    assert(Multimodal.imageFrames(corrupt, 1).isEmpty)
    // a tiny payload declaring 30000x30000 in its IHDR (CRC recomputed so
    // the header parses): the dims guard must refuse before read()
    // eagerly allocates a multi-GB raster
    val huge = good.clone()
    def putInt(at: Int, v: Int): Unit = {
      huge(at) = (v >>> 24).toByte; huge(at + 1) = (v >>> 16).toByte
      huge(at + 2) = (v >>> 8).toByte; huge(at + 3) = v.toByte
    }
    putInt(16, 30000) // IHDR width (sig 8 + len 4 + "IHDR" 4)
    putInt(20, 30000) // IHDR height
    val crc = new java.util.zip.CRC32()
    crc.update(huge, 12, 17) // chunk type + 13 data bytes
    putInt(29, crc.getValue.toInt)
    assert(Multimodal.decodeImage(huge).isEmpty)
    assert(Multimodal.imageFrames(huge, 1).isEmpty)
    // and the Spark path stays total: adversarial rows degrade to "raw"
    import spark.implicits._
    val df = Seq((1L, corrupt), (2L, huge)).toDF("id", "payload")
    val out = Multimodal.withMediaFeatures(df, "payload").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("media_format") == "raw"))
  }

  test("real bilinear resize: output decodes at the target dims") {
    val png = Multimodal.synthPng(64, 48, seed = 7L)
    val resized = Multimodal.resizeImage(png, 16, 12)
    val (w, h, fmt, _, _) = Multimodal.decode(resized)
    assert((w, h, fmt) == (16, 12, "png"))
    // deterministic and real: identical bytes across invocations
    assert(resized.toSeq == Multimodal.resizeImage(png, 16, 12).toSeq)
    // a constant-color image stays constant under interpolation
    val flat = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until 32).foreach(y => (0 until 32).foreach(x =>
        img.getRaster.setSample(x, y, 0, 200)))
      Multimodal.encodePng(img)
    }
    val flatSmall = Multimodal.decodeImage(Multimodal.resizeImage(flat, 8, 8)).get._1
    (0 until 8).foreach(y => (0 until 8).foreach(x =>
      assert(flatSmall.getRaster.getSample(x, y, 0) == 200)))
    // non-image input → no raster to resize
    assert(Multimodal.resizeImage("not an image".getBytes, 8, 8).isEmpty)
  }

  test("16-bit grayscale decodes with scaled luma, not clamped") {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    // sample v<<8 corresponds to 8-bit luma v exactly
    (0 until 4).foreach(y => (0 until 4).foreach(x =>
      img.getRaster.setSample(x, y, 0, ((x + y * 4) * 17) << 8)))
    val png = Multimodal.encodePng(img)
    val (w, h, _, _, lsum) = Multimodal.decode(png)
    assert((w, h) == (4, 4))
    val expected = (0 until 16).map(_ * 17).sum.toLong
    assert(lsum == expected, s"16-bit luma must scale (got $lsum, want $expected)")
  }

  test("real multi-frame decode: animated GIF frames with exact luma") {
    val gif = Multimodal.synthGif(12, 8, Seq(10, 200, 77, 145, 33))
    // a real GIF container
    assert(new String(gif.take(4), "ISO-8859-1") == "GIF8")
    val all = Multimodal.imageFrames(gif, everyNth = 1)
    assert(all.map(_._1) == Seq(0, 1, 2, 3, 4))
    all.zip(Seq(10, 200, 77, 145, 33)).foreach { case ((_, w, h, luma), g) =>
      assert((w, h) == (12, 8))
      assert(luma == g.toLong * 12 * 8, s"gray $g must survive palette quantization")
    }
    // every-2nd sampling keeps stored frame indices
    assert(Multimodal.imageFrames(gif, everyNth = 2).map(_._1) == Seq(0, 2, 4))
    // non-image payloads explode to nothing, not an error
    assert(Multimodal.imageFrames("not media".getBytes, 2).isEmpty)
    // DataFrame explode shape
    import spark.implicits._
    val df = Seq((1L, gif)).toDF("doc_id", "media")
    val rows = Multimodal.explodeImageFrames(df, "media", 2)
      .select("frame_idx", "frame_luma").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 2, 4))
    assert(rows.map(_.getLong(1)).toSeq == Seq(10L * 96, 77L * 96, 33L * 96))
  }

  test("other ImageIO containers decode: BMP exactly, JPEG dims, TIFF pages") {
    import javax.imageio.ImageIO
    val src = Multimodal.decodeImage(Multimodal.synthPng(20, 14, 5L)).get._1
    def encode(fmt: String): Option[Array[Byte]] = {
      val bos = new java.io.ByteArrayOutputStream()
      if (ImageIO.write(src, fmt, bos)) Some(bos.toByteArray) else None
    }
    // BMP is lossless: dims AND luma round-trip
    encode("bmp").foreach { bmp =>
      val (w, h, fmt, _, lsum) = Multimodal.decode(bmp)
      assert((w, h, fmt) == (20, 14, "bmp"))
      assert(lsum == Multimodal.lumaSum(Multimodal.synthPng(20, 14, 5L)))
    }
    // JPEG is lossy: dims and format are the contract
    encode("jpg").foreach { jpg =>
      val (w, h, fmt, _, _) = Multimodal.decode(jpg)
      assert((w, h) == (20, 14) && fmt.startsWith("jp"), fmt)
    }
    // multi-page TIFF rides the same frame path as animated GIF
    val tiffWriters = ImageIO.getImageWritersByFormatName("tiff")
    if (tiffWriters.hasNext) {
      val writer = tiffWriters.next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        Seq(40, 120, 250).foreach { g =>
          val img = new java.awt.image.BufferedImage(6, 5,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          (0 until 5).foreach(y => (0 until 6).foreach(x =>
            img.getRaster.setSample(x, y, 0, g)))
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      val frames = Multimodal.imageFrames(bos.toByteArray, everyNth = 1)
      assert(frames.map(_._1) == Seq(0, 1, 2))
      assert(frames.map(_._4) == Seq(40L * 30, 120L * 30, 250L * 30))
    }
  }

  test("frame sampling: every Nth frame, correct count and checksums") {
    val bytes = Array.tabulate(100)(_.toByte) // 7 frames of 16 (last partial)
    val frames = Multimodal.sampleFrames(bytes, frameSize = 16, everyNth = 2)
    assert(frames.map(_._1) == Seq(0, 2, 4, 6))
    // frame 0 checksum = sum(0..15) mod 256
    assert(frames.head._2 == (0 until 16).sum % 256)
    // exploding in a DataFrame multiplies rows by the sampled-frame count
    import spark.implicits._
    val df = Seq((1L, bytes)).toDF("doc_id", "payload")
    val exploded = Multimodal.explodeFrames(df, "payload", 16, 2)
    assert(exploded.count() == 4)
    assert(exploded.select("frame_idx").collect().map(_.getInt(0)).toSeq == Seq(0, 2, 4, 6))
  }

  test("polygon → pixel bbox → real PNG crop with exact pixels (C2/K5)") {
    val imgW = 104
    val imgH = 64
    val page = Multimodal.synthPng(imgW, imgH, seed = 9L)
    // polygon covering [2,6]x[3,5] inches of a 20x20-inch page scales to
    // round(frac * raster)
    val poly = Seq(2.0, 3.0, 6.0, 3.0, 6.0, 5.0, 2.0, 5.0)
    val x0 = math.round(2.0 / 20 * imgW).toInt
    val y0 = math.round(3.0 / 20 * imgH).toInt
    assert(Multimodal.pixelBBox(poly, 20, 20, imgW, imgH) ==
      ((x0, y0, math.round(6.0 / 20 * imgW).toInt, math.round(5.0 / 20 * imgH).toInt)))
    val (cw, ch, bytes) = Multimodal.cropFigure(page, poly, 20, 20)
    assert(cw == math.round(6.0 / 20 * imgW).toInt - x0)
    assert(ch == math.round(5.0 / 20 * imgH).toInt - y0)
    // the crop is a REAL PNG whose pixel (x, y) equals page pixel
    // (x0 + x, y0 + y) — getSubimage + re-encode lost nothing
    val crop = Multimodal.decodeImage(bytes).get._1
    assert((crop.getWidth, crop.getHeight) == (cw, ch))
    for (y <- 0 until ch; x <- 0 until cw) {
      val exp = ((9L * 31 + (x0 + x) * 7 + (y0 + y) * 13) % 256).toInt
      assert(crop.getRaster.getSample(x, y, 0) == exp,
        s"crop pixel ($x,$y) diverged from the page raster")
    }
    // degenerate polygon → empty crop, never a whole-page payload
    val deg = Multimodal.cropFigure(page, Seq(5.0, 5.0, 5.0, 5.0), 20, 20)
    assert(deg._1 == 0 && deg._2 == 0 && deg._3.isEmpty)
    // non-image page bytes → no crop
    val none = Multimodal.cropFigure("plain text".getBytes, poly, 20, 20)
    assert(none._1 == 0 && none._3.isEmpty)
    // DataFrame path: crop columns appear and K5 writes the crop, not the page
    import spark.implicits._
    val figs = Seq(("fig-9", page, poly)).toDF("figure_id", "payload", "polygon")
      .withColumn("page_width", lit(20.0)).withColumn("page_height", lit(20.0))
    val cropped = Multimodal.withFigureCrops(figs, "payload")
    val row = cropped.select("crop_width", "crop_height", "figure_bytes").head()
    assert(row.getInt(0) == cw && row.getInt(1) == ch)
    assert(row.getAs[Array[Byte]](2).toSeq == bytes.toSeq)
    val dir = java.nio.file.Files.createTempDirectory("graft-crops").toString
    Multimodal.writeFigureBlobs(cropped, "figure_bytes", "figure_id", dir)
    val f = new java.io.File(dir, "fig-9.png")
    assert(f.exists() && f.length() == bytes.length, "K5 must store the geometry crop")
    // the stored file is itself a decodable PNG at the crop dims
    val stored = Multimodal.decodeImage(
      java.nio.file.Files.readAllBytes(f.toPath)).get._1
    assert((stored.getWidth, stored.getHeight) == (cw, ch))
  }

  test("caption stub + K5 figure blob side-output") {
    import spark.implicits._
    val png = Multimodal.synthPng(40, 30, seed = 3L)
    val figs = Seq(("fig-1", png)).toDF("figure_id", "payload")
    val withMeta = Multimodal.withMediaFeatures(figs, "payload")
    val captioned = Multimodal.attachCaptions(withMeta, new LeadingSentencesSummarizer(1))
    val cap = captioned.select("caption").head().getString(0)
    assert(cap.startsWith("figure fig-1 rendered at 40x30"))
    val dir = java.nio.file.Files.createTempDirectory("graft-figs").toString
    Multimodal.writeFigureBlobs(captioned, "payload", "figure_id", dir)
    val f = new java.io.File(dir, "fig-1.png")
    assert(f.exists())
    assert(java.nio.file.Files.readAllBytes(f.toPath).toSeq == png.toSeq)
  }
}
