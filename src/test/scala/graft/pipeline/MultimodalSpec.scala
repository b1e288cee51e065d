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

  test("binary decode stub + feature extraction plumbing (C2)") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "")).toDF("id", "text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val out = Multimodal.withMediaFeatures(df, "payload").collect()
    assert(out.length == 2)
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getAs[String]("media_format") == "stub")
    val feats = r1.getAs[scala.collection.Seq[Float]]("media_features")
    assert(feats.length == 16)
    val norm = math.sqrt(feats.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // deterministic
    val again = Multimodal.withMediaFeatures(df, "payload").collect()
      .find(_.getLong(0) == 1L).get.getAs[scala.collection.Seq[Float]]("media_features")
    assert(again == feats)
  }

  test("resize stub: bounded output, deterministic, bytes drawn from input") {
    val bytes = Array.tabulate(1024)(i => (i % 251).toByte)
    val out = Multimodal.resizeStub(bytes, 64, 64)
    assert(out.length <= 64 * 64 / 64)
    assert(out.length > 0)
    assert(out.toSeq == Multimodal.resizeStub(bytes, 64, 64).toSeq)
    assert(out.forall(bytes.contains))
    assert(Multimodal.resizeStub(Array.emptyByteArray, 64, 64).isEmpty)
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

  test("polygon → pixel bbox → crop: dims derive from geometry (C2/K5)") {
    // a 1000-byte page decodes to a 104x344 stub raster (64 + len%960 wide,
    // 64 + len*7%960 tall)
    val page = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val (imgW, imgH, _, _) = Multimodal.decodeStub(page)
    assert((imgW, imgH) == (64 + 1000 % 960, 64 + 7000 % 960))
    // polygon covering [2,6]x[3,5] inches of a 20x20-inch page scales to
    // round(frac * raster): x 10..31, y 17..28
    val poly = Seq(2.0, 3.0, 6.0, 3.0, 6.0, 5.0, 2.0, 5.0)
    assert(Multimodal.pixelBBox(poly, 20, 20, imgW, imgH) ==
      ((math.round(2.0 / 20 * imgW).toInt, math.round(3.0 / 20 * imgH).toInt,
        math.round(6.0 / 20 * imgW).toInt, math.round(5.0 / 20 * imgH).toInt)))
    val (cw, ch, bytes) = Multimodal.cropStub(page, poly, 20, 20)
    assert(cw == math.round(6.0 / 20 * imgW).toInt - math.round(2.0 / 20 * imgW).toInt)
    assert(ch == math.round(5.0 / 20 * imgH).toInt - math.round(3.0 / 20 * imgH).toInt)
    assert(bytes.length == cw * ch)
    // the crop is the row-major slice of the page buffer, not a prefix
    val x0 = math.round(2.0 / 20 * imgW).toInt
    val y0 = math.round(3.0 / 20 * imgH).toInt
    assert(bytes(0) == page((y0 * imgW + x0) % page.length))
    assert(bytes(cw) == page(((y0 + 1) * imgW + x0) % page.length)) // next row
    // degenerate polygon → empty crop, never a whole-page payload
    val deg = Multimodal.cropStub(page, Seq(5.0, 5.0, 5.0, 5.0), 20, 20)
    assert(deg._1 == 0 && deg._2 == 0 && deg._3.isEmpty)
    // DataFrame path: crop columns appear and K5 writes the crop, not the page
    import spark.implicits._
    val figs = Seq(("fig-9", page, poly)).toDF("figure_id", "payload", "polygon")
      .withColumn("page_width", lit(20.0)).withColumn("page_height", lit(20.0))
    val cropped = Multimodal.withFigureCrops(figs, "payload")
    val row = cropped.select("crop_width", "crop_height", "figure_bytes").head()
    assert(row.getInt(0) == cw && row.getInt(1) == ch)
    assert(row.getAs[Array[Byte]](2).length == cw * ch)
    val dir = java.nio.file.Files.createTempDirectory("graft-crops").toString
    Multimodal.writeFigureBlobs(cropped, "figure_bytes", "figure_id", dir)
    val f = new java.io.File(dir, "fig-9.bin")
    assert(f.exists() && f.length() == cw * ch, "K5 must store the geometry crop")
  }

  test("caption stub + K5 figure blob side-output") {
    import spark.implicits._
    val figs = Seq(("fig-1", "payload-bytes")).toDF("figure_id", "text")
      .withColumn("payload", encode($"text", "UTF-8"))
    val withMeta = Multimodal.withMediaFeatures(figs, "payload")
    val captioned = Multimodal.attachCaptions(withMeta, new LeadingSentencesSummarizer(1))
    val cap = captioned.select("caption").head().getString(0)
    assert(cap.startsWith("figure fig-1 rendered at"))
    val dir = java.nio.file.Files.createTempDirectory("graft-figs").toString
    Multimodal.writeFigureBlobs(captioned, "payload", "figure_id", dir)
    val f = new java.io.File(dir, "fig-1.bin")
    assert(f.exists())
    assert(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8") == "payload-bytes")
  }
}
