package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.services.Summarizer

/** Multimodal column plumbing (SURVEY §2.9 C2, §2.2 K5, §2.3 F8, §2.8 X13).
  *
  * Media payloads are opaque `binary` columns with typed metadata structs —
  * the schema/partitioning/batching are real; only the codec call is a
  * deterministic stub (image/audio libraries are not in this container; a
  * real decoder drops into [[decodeStub]] without touching the plan). The
  * decode/feature stage runs as iterator-style mapPartitions — the JVM
  * analog of `mapInPandas` batches — so one task amortizes codec init.
  */
object Multimodal {

  val figureSchema: StructType = StructType(Seq(
    StructField("figure_id", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("polygon", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("page_width", DoubleType, nullable = false),
    StructField("page_height", DoubleType, nullable = false)))

  /** X13: shoelace area of a flat [x0,y0,x1,y1,...] polygon. */
  def polygonArea(poly: Seq[Double]): Double = {
    val n = poly.length / 2
    if (n < 3) return 0.0
    var s = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += poly(2 * i) * poly(2 * j + 1) - poly(2 * j) * poly(2 * i + 1)
      i += 1
    }
    math.abs(s) / 2.0
  }

  /** Percentage of page area covered (F8 predicate input). */
  def figureAreaPct(poly: Seq[Double], pageW: Double, pageH: Double): Double =
    if (pageW <= 0 || pageH <= 0) 0.0 else polygonArea(poly) / (pageW * pageH) * 100.0

  private val areaPctUdf = udf((p: Seq[Double], w: Double, h: Double) => figureAreaPct(p, w, h))

  /** F8: drop figures whose page-area share is below the threshold. */
  def filterSmallFigures(figures: DataFrame, minAreaPct: Double = 4.0): DataFrame =
    figures.filter(areaPctUdf(col("polygon"), col("page_width"), col("page_height")) > minAreaPct)

  /** Deterministic stand-in for an image decode: derives (width, height,
    * format) and a 16-bin byte histogram "feature" from the payload bytes.
    * Mirrors a real decoder's signature: bytes in → metadata + features out.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String, Array[Float]) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, "empty", new Array[Float](16))
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1.0f; i += 1 }
    var norm = 0.0
    hist.foreach(x => norm += x.toDouble * x)
    val inv = if (norm == 0) 0.0f else (1.0 / math.sqrt(norm)).toFloat
    (0 until 16).foreach(j => hist(j) *= inv)
    val w = 64 + (bytes.length % 960)
    val h = 64 + ((bytes.length * 7) % 960)
    (w, h, "stub", hist)
  }

  /** Decode + feature-extract a binary column in partition-sized batches.
    * Input needs (binCol: binary); appends media_width, media_height,
    * media_format, media_features.
    */
  def withMediaFeatures(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("media_width", IntegerType),
      StructField("media_height", IntegerType),
      StructField("media_format", StringType),
      StructField("media_features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // one "codec" per task; batches keep the call amortized like mapInPandas
      rows.map { r =>
        val (w, h, fmt, feat) = decodeStub(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq ++ Seq(w, h, fmt, feat.toSeq))
      }
    }(enc)
  }

  /** Deterministic "resize": returns payload bytes strided down so the
    * output length matches the target pixel budget — the real resizer's
    * signature and batch shape (bytes→bytes inside the same task), with the
    * codec swapped for arithmetic.
    */
  def resizeStub(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW > 0 && targetH > 0, s"target dims must be positive, got ${targetW}x$targetH")
    if (bytes == null || bytes.isEmpty) return Array.emptyByteArray
    val target = math.max(1, math.min(bytes.length, targetW * targetH / 64))
    val stride = math.max(1, bytes.length / target)
    val out = new Array[Byte](math.min(target, (bytes.length + stride - 1) / stride))
    var i = 0
    while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
    out
  }

  /** Frame sampling as a one-to-many explode: treat the payload as
    * fixed-size frames, emit every `everyNth` frame with its index and a
    * byte checksum. A real video decoder swaps into the frame iterator;
    * the explode shape (and therefore the plan) is identical.
    */
  def sampleFrames(bytes: Array[Byte], frameSize: Int, everyNth: Int): Seq[(Int, Int)] = {
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    if (bytes == null || bytes.isEmpty) return Seq.empty
    val nFrames = (bytes.length + frameSize - 1) / frameSize
    (0 until nFrames by everyNth).map { f =>
      val start = f * frameSize
      val end = math.min(start + frameSize, bytes.length)
      var sum = 0
      var i = start
      while (i < end) { sum += bytes(i) & 0xff; i += 1 }
      (f, sum % 256)
    }
  }

  private val resizeUdf = udf((b: Array[Byte], w: Int, h: Int) => resizeStub(b, w, h))
  private val framesUdf = udf((b: Array[Byte], fs: Int, n: Int) => sampleFrames(b, fs, n))

  /** Resize the binary column in place (bytes→bytes column transform). */
  def withResized(df: DataFrame, binCol: String, targetW: Int, targetH: Int): DataFrame =
    df.withColumn(s"${binCol}_resized", resizeUdf(col(binCol), lit(targetW), lit(targetH)))

  /** Explode sampled frames: adds (frame_idx, frame_checksum) rows. */
  def explodeFrames(df: DataFrame, binCol: String, frameSize: Int, everyNth: Int): DataFrame =
    df.withColumn("_f", explode(framesUdf(col(binCol), lit(frameSize), lit(everyNth))))
      .withColumn("frame_idx", col("_f._1"))
      .withColumn("frame_checksum", col("_f._2"))
      .drop("_f")

  /** Pixel bounding box of a page-unit polygon scaled into an imgW×imgH
    * raster: the geometry step of the reference's figure extraction (the
    * DocIntelligence service crops the figure PNG from the polygon's
    * bounding region; multimodal_chunker.py:277-295 fetches the result).
    * Clamped to the raster; returns (x0, y0, x1, y1), empty boxes allowed.
    */
  def pixelBBox(poly: Seq[Double], pageW: Double, pageH: Double,
      imgW: Int, imgH: Int): (Int, Int, Int, Int) = {
    if (poly.length < 4 || pageW <= 0 || pageH <= 0 || imgW <= 0 || imgH <= 0)
      return (0, 0, 0, 0)
    val xs = poly.indices.collect { case i if i % 2 == 0 => poly(i) }
    val ys = poly.indices.collect { case i if i % 2 == 1 => poly(i) }
    def clampX(v: Double) = math.max(0, math.min(imgW, math.round(v / pageW * imgW).toInt))
    def clampY(v: Double) = math.max(0, math.min(imgH, math.round(v / pageH * imgH).toInt))
    (clampX(xs.min), clampY(ys.min), clampX(xs.max), clampY(ys.max))
  }

  /** Crop the figure's pixel box out of the page payload: the page bytes are
    * treated as the row-major imgW×imgH buffer [[decodeStub]] describes, and
    * the crop copies exactly the rows/cols inside the polygon's bbox — a
    * real raster crop with the codec swapped for modular addressing.
    * Returns (crop_width, crop_height, bytes), empty for degenerate boxes.
    */
  def cropStub(pageBytes: Array[Byte], poly: Seq[Double],
      pageW: Double, pageH: Double): (Int, Int, Array[Byte]) = {
    if (pageBytes == null || pageBytes.isEmpty) return (0, 0, Array.emptyByteArray)
    val (imgW, imgH, _, _) = decodeStub(pageBytes)
    val (x0, y0, x1, y1) = pixelBBox(poly, pageW, pageH, imgW, imgH)
    val cw = x1 - x0
    val ch = y1 - y0
    if (cw <= 0 || ch <= 0) return (0, 0, Array.emptyByteArray)
    val out = new Array[Byte](cw * ch)
    var y = 0
    while (y < ch) {
      var x = 0
      while (x < cw) {
        out(y * cw + x) = pageBytes(((y0 + y) * imgW + (x0 + x)) % pageBytes.length)
        x += 1
      }
      y += 1
    }
    (cw, ch, out)
  }

  private val cropUdf = udf((b: Array[Byte], poly: Seq[Double], w: Double, h: Double) =>
    cropStub(b, poly, w, h))

  /** C2/K5: derive per-figure payloads from page payload + polygon geometry.
    * Input needs (pageBin: binary, polygon, page_width, page_height);
    * appends crop_width, crop_height, figure_bytes — the rows K5's
    * [[writeFigureBlobs]] then writes as individual figure files, so the
    * sink stores geometry-derived crops, never whole pages.
    */
  def withFigureCrops(df: DataFrame, pageBin: String): DataFrame =
    df.withColumn("_c", cropUdf(col(pageBin), col("polygon"),
        col("page_width"), col("page_height")))
      .withColumn("crop_width", col("_c._1"))
      .withColumn("crop_height", col("_c._2"))
      .withColumn("figure_bytes", col("_c._3"))
      .drop("_c")

  /** C2 caption stage: deterministic caption stub + the chunk⋈figure join
    * shape (J6): explode figure refs, enrich, re-aggregate per chunk.
    */
  def attachCaptions(figures: DataFrame, captioner: Summarizer): DataFrame = {
    val cap = udf((id: String, w: Int, h: Int) =>
      captioner.summarize(s"figure $id rendered at ${w}x$h pixels."))
    figures.withColumn("caption", cap(col("figure_id"), col("media_width"), col("media_height")))
  }

  /** K5 side-output sink: write figure payloads as individual files under
    * outDir (the `documents-images` container analog). Runs on executors.
    */
  def writeFigureBlobs(figures: DataFrame, binCol: String, idCol: String, outDir: String): Unit = {
    val bin = figures.schema.fieldIndex(binCol)
    val idIdx = figures.schema.fieldIndex(idCol)
    figures.foreachPartition { rows: Iterator[Row] =>
      val dir = new java.io.File(outDir)
      dir.mkdirs()
      rows.foreach { r =>
        val f = new java.io.File(dir, r.getString(idIdx) + ".bin")
        val os = new java.io.FileOutputStream(f)
        try os.write(r.getAs[Array[Byte]](bin)) finally os.close()
      }
    }
  }
}
