package graft.pipeline

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.services.Summarizer

/** Multimodal column plumbing (SURVEY §2.9 C2, §2.2 K5, §2.3 F8, §2.8 X13).
  *
  * Media payloads are opaque `binary` columns with typed metadata structs.
  * Image decode, resize, and figure crop are REAL codecs via `javax.imageio`
  * (PNG/JPEG/BMP/GIF, TIFF on modern JDKs — no external dependency): bytes
  * decode to a `BufferedImage`, features come from actual pixels, crops are
  * `getSubimage` rasters re-encoded as PNG — the same crop → store shape as
  * the reference's figure extraction (multimodal_chunker.py:449-517). VIDEO
  * containers decode for real too ([[graft.formats.Avi]] raw-DIB/MJPEG and
  * [[graft.formats.Mp4]] sample tables, driven by [[Video]]); the generic
  * fixed-stride byte chopper ([[sampleFrames]]) remains only for codec-less
  * payloads. The decode/feature stage runs as iterator-style mapPartitions —
  * the JVM analog of `mapInPandas` batches — so one task amortizes codec
  * init.
  */
object Multimodal {

  // in-memory decode on executors: never spill codec scratch to temp files
  ImageIO.setUseCache(false)

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

  /** Hard ceiling on decoded raster size. Dimensions come from a few header
    * bytes the payload fully controls, and `ImageReader.read` allocates the
    * raster eagerly — a 67-byte "30000×30000 PNG" would be a multi-GB
    * allocation inside an executor. Past the cap the payload is treated as
    * not-an-image rather than decoded.
    */
  private val MaxDecodePixels = 64L * 1024 * 1024

  /** Decode any ImageIO-supported container (PNG/JPEG/BMP/GIF/WBMP; TIFF on
    * JDK 9+). Returns the raster plus the reader's format name, or None when
    * no installed reader claims the payload (not an image), the payload is
    * malformed past the header, or the declared dimensions exceed
    * [[MaxDecodePixels]]. Total over arbitrary bytes: a mixed binary column
    * must never fail the task.
    */
  def decodeImage(bytes: Array[Byte]): Option[(BufferedImage, String)] = {
    if (bytes == null || bytes.length < 4) return None
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            // header-only dims; reject runaway declarations BEFORE read()
            // allocates the raster
            val (w, h) = (r.getWidth(0).toLong, r.getHeight(0).toLong)
            if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) None
            else Some((r.read(0), r.getFormatName.toLowerCase))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch {
      // ImageIO readers throw unchecked exceptions on malformed bodies
      // (IllegalArgumentException, IndexOutOfBounds, CMMException, …), not
      // just IOException — any failure means "not an image"
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Deterministic synthetic grayscale PNG: pixel (x, y) holds
    * `(seed·31 + x·7 + y·13) mod 256`. A REAL PNG container (encoded and
    * decoded by ImageIO) whose pixel values any engine can recompute
    * arithmetically — the m1/m2 oracles pin the decode round-trip exactly.
    */
  def synthPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive, got ${width}x$height")
    require(seed >= 0, s"seed must be non-negative, got $seed")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, ((seed * 31 + x * 7L + y * 13L) % 256).toInt)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Constant-gray PNG — interpolation-invariant (resampling equal values
    * yields the value), so resize round-trips are exactly predictable: the
    * m3 oracle pins decoded dims AND the post-resize luma sum.
    */
  def constPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive, got ${width}x$height")
    require(gray >= 0 && gray <= 255, s"gray must be a byte value, got $gray")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, gray); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  /** Deterministic smooth "spectral" grayscale PNG: the image is a sum of
    * the 63 low-frequency 2D-DCT basis functions, each weighted by a ±1
    * sign drawn from an integer mix of (seed, u, v), rendered in CONTINUOUS
    * coordinates (`cos(πu(x+½)/w)·cos(πv(y+½)/h)`) so the same seed painted
    * at any pixel size carries the same normalized content. A perceptual
    * hash of such an image recovers the planted sign pattern: [[phash64]]
    * of two renders of one seed agree within a few bits at any size, while
    * independent seeds disagree on ~half the bits — the exact
    * invariance/discrimination contract image near-dup blocking needs, with
    * the clustering predictable arithmetically from the seed alone.
    * StrictMath keeps rendering bit-identical across JVMs.
    */
  def spectralPng(seed: Long, width: Int, height: Int): Array[Byte] =
    encodePng(spectralImage(seed, width, height))

  /** Fixture-render memo: dedup corpora render the SAME (seed, size)
    * pattern for every group member (m5: 225 distinct images for 5000
    * docs; m11: 540 distinct frames), so each executor renders a distinct
    * pattern once. Rendering is deterministic, cached rasters are only
    * ever read, and the cap bounds executor memory; correctness is
    * byte-identical with the cache off.
    */
  private val spectralCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), BufferedImage]()
  private val SpectralCacheMax = 4096

  /** The raster behind [[spectralPng]] — also rendered directly into raw
    * video frames ([[graft.pipeline.Video]]), where the same
    * invariance/discrimination contract drives frame-voted near-dup.
    * Callers must treat the returned raster as read-only (it is shared
    * through the render memo).
    */
  def spectralImage(seed: Long, width: Int, height: Int): BufferedImage = {
    val key = (seed, width, height)
    val hit = spectralCache.get(key)
    if (hit != null) return hit
    val img = renderSpectral(seed, width, height)
    if (spectralCache.size >= SpectralCacheMax) spectralCache.clear()
    spectralCache.put(key, img)
    img
  }

  private def renderSpectral(seed: Long, width: Int, height: Int): BufferedImage = {
    require(width > 0 && height > 0, s"dims must be positive, got ${width}x$height")
    val n = PhashLow
    // per-(u,v) sign from a splitmix-style integer mix — no RNG state
    def sign(u: Int, v: Int): Double = {
      var z = seed + 0x9e3779b97f4a7c15L * (u * n + v + 1)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
    }
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    val cw = Array.tabulate(n, width)((u, x) =>
      StrictMath.cos(StrictMath.PI * u * (x + 0.5) / width))
    val ch = Array.tabulate(n, height)((v, y) =>
      StrictMath.cos(StrictMath.PI * v * (y + 0.5) / height))
    // row-factor table m(v)(x) = Σu sign(u,v)·cw(u)(x): turns the pixel
    // loop from 63 into n mults — the fixture render, not the hash, is
    // the hot path when a whole corpus synthesizes payloads
    val m = Array.tabulate(n, width) { (v, x) =>
      var s = 0.0
      var u = if (v == 0) 1 else 0
      while (u < n) { s += sign(u, v) * cw(u)(x); u += 1 }
      s
    }
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var s = 0.0
        var v = 0
        while (v < n) { s += m(v)(x) * ch(v)(y); v += 1 }
        // ±63 worst case but ~N(0,√63) typically; gentle scale, rare clamp
        val px = StrictMath.round(127.5 + 4.0 * s).toInt
        raster.setSample(x, y, 0, 0 max px min 255)
        x += 1
      }
      y += 1
    }
    img
  }

  private val PhashGrid = 32 // downsample grid; DCT input
  private val PhashLow = 8   // low-frequency block kept from the DCT

  // cos(π(2i+1)u / 2N) for the separable DCT-II — precomputed once per JVM
  private lazy val phashCos: Array[Array[Double]] =
    Array.tabulate(PhashLow, PhashGrid)((u, i) =>
      StrictMath.cos(StrictMath.PI * (2 * i + 1) * u / (2.0 * PhashGrid)))

  /** 64-bit perceptual hash (the classic DCT pHash): decode → area-average
    * the luma plane onto a 32×32 grid → 2D DCT-II → keep the 8×8
    * low-frequency block → threshold each AC coefficient against the
    * MEAN of the 63 AC values (the mean-variant of pHash — see the inline
    * note at the threshold loop; bit 63, the DC slot, stays 0). Images
    * that differ only by scale/re-encode/mild noise land within a few bits
    * of Hamming distance; structurally different images land ~32 apart —
    * which makes the SAME pigeonhole blocking used for SimHash text dedup
    * ([[graft.operators.Dedup.simhashNearDupPairs]]) work unchanged for
    * image near-dup. Returns None for undecodable payloads.
    */
  def phash64(bytes: Array[Byte]): Option[Long] = decodeImage(bytes).map {
    case (img, _) => phashImage(img)
  }

  /** [[phash64]] over an already-decoded raster — the video path hashes
    * container-decoded frames without a re-encode round-trip.
    */
  def phashImage(img: BufferedImage): Long = {
      val n = PhashGrid
      val w = img.getWidth
      val h = img.getHeight
      val gray8 = img.getType == BufferedImage.TYPE_BYTE_GRAY
      val gray16 = img.getType == BufferedImage.TYPE_USHORT_GRAY
      val raster = img.getRaster
      // area-average box resample onto the n×n grid (deterministic integer
      // box bounds; every source pixel lands in exactly one cell)
      val grid = new Array[Double](n * n)
      val cnt = new Array[Int](n * n)
      var y = 0
      while (y < h) {
        val gy = (y.toLong * n / h).toInt
        var x = 0
        while (x < w) {
          val l =
            if (gray8) raster.getSample(x, y, 0)
            else if (gray16) raster.getSample(x, y, 0) >> 8
            else luma(img.getRGB(x, y))
          val c = gy * n + (x.toLong * n / w).toInt
          grid(c) += l
          cnt(c) += 1
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < n * n) {
        // images smaller than the grid leave empty cells at 0 — still
        // deterministic, and identical across equal inputs
        if (cnt(i) > 0) grid(i) /= cnt(i)
        i += 1
      }
      // separable DCT-II, only the PhashLow×PhashLow low-frequency corner
      val rows = Array.ofDim[Double](n, PhashLow) // rows(y)(u) = Σx grid(y,x)·cos(u)
      y = 0
      while (y < n) {
        var u = 0
        while (u < PhashLow) {
          var s = 0.0
          var x = 0
          while (x < n) { s += grid(y * n + x) * phashCos(u)(x); x += 1 }
          rows(y)(u) = s
          u += 1
        }
        y += 1
      }
      val ac = new Array[Double](PhashLow * PhashLow)
      var v = 0
      while (v < PhashLow) {
        var u = 0
        while (u < PhashLow) {
          var s = 0.0
          var yy = 0
          while (yy < n) { s += rows(yy)(u) * phashCos(v)(yy); yy += 1 }
          ac(v * PhashLow + u) = s
          u += 1
        }
        v += 1
      }
      // threshold against the AC MEAN (the mean-variant of pHash): for
      // near-binary coefficient distributions the mean sits in the gap
      // around zero, where the median would sit ON the positive cluster
      // and turn near-tie bits into noise
      var mean = 0.0
      var maxAbs = 0.0
      i = 1
      while (i < PhashLow * PhashLow) {
        mean += ac(i)
        maxAbs = maxAbs max StrictMath.abs(ac(i))
        i += 1
      }
      mean /= (PhashLow * PhashLow - 1)
      // epsilon relative to the spectrum's own scale: a blank raster's AC
      // values are pure float noise around zero — without the guard its
      // bits would be noise too; with it every flat image hashes to 0
      val eps = 1e-6 * (maxAbs + 1.0)
      var bits = 0L
      i = 1
      while (i < PhashLow * PhashLow) {
        if (ac(i) - mean > eps) bits |= 1L << (i - 1)
        i += 1
      }
      bits
  }

  /** Lossless PNG encode of a raster (figure crops, resizes). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** ITU-R 601 integer luma; exact identity for grayscale pixels
    * ((299 + 587 + 114)·g / 1000 == g).
    */
  private def luma(rgb: Int): Int =
    (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000

  /** One pixel pass: 16-bin luma histogram (L2-normalized) + exact luma sum.
    * Single-band rasters read samples directly — getRGB would gamma-map
    * linear gray into sRGB and break the exact-arithmetic oracle pin.
    */
  private def lumaStats(img: BufferedImage): (Array[Float], Long) = {
    val w = img.getWidth
    val h = img.getHeight
    val hist = new Array[Float](16)
    var sum = 0L
    // true grayscale only — a palette-indexed image also has a 1-band
    // raster, but its samples are palette INDEXES, not luma
    val gray8 = img.getType == BufferedImage.TYPE_BYTE_GRAY
    val gray16 = img.getType == BufferedImage.TYPE_USHORT_GRAY
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l =
          if (gray8) raster.getSample(x, y, 0)
          // 16-bit samples SCALE to 8-bit luma; clamping would pin
          // virtually every pixel of a real 16-bit image at 255
          else if (gray16) raster.getSample(x, y, 0) >> 8
          else luma(img.getRGB(x, y))
        hist(l >> 4) += 1.0f
        sum += l
        x += 1
      }
      y += 1
    }
    (l2normalize(hist), sum)
  }

  private def l2normalize(hist: Array[Float]): Array[Float] = {
    var n = 0.0
    hist.foreach(x => n += x.toDouble * x)
    val inv = if (n == 0) 0.0f else (1.0 / math.sqrt(n)).toFloat
    hist.map(_ * inv)
  }

  /** Image decode: real metadata + pixel features for any ImageIO format.
    * Non-image payloads degrade to a byte-nibble histogram with no raster
    * (dims 0×0, format "raw") so mixed binary columns stay total.
    */
  def decode(bytes: Array[Byte]): (Int, Int, String, Array[Float], Long) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, "empty", new Array[Float](16), 0L)
    decodeImage(bytes) match {
      case Some((img, fmt)) =>
        val (hist, sum) = lumaStats(img)
        (img.getWidth, img.getHeight, fmt, hist, sum)
      case None =>
        val hist = new Array[Float](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1.0f; i += 1 }
        (0, 0, "raw", l2normalize(hist), 0L)
    }
  }

  /** Exact pixel-luma sum of an image payload (0 for non-images) — the
    * integer decode fingerprint the m1 oracle recomputes arithmetically.
    */
  def lumaSum(bytes: Array[Byte]): Long =
    decodeImage(bytes).map(p => lumaStats(p._1)._2).getOrElse(0L)

  /** Decode + feature-extract a binary column in partition-sized batches.
    * Input needs (binCol: binary); appends media_width, media_height,
    * media_format, media_features, media_luma.
    */
  def withMediaFeatures(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("media_width", IntegerType),
      StructField("media_height", IntegerType),
      StructField("media_format", StringType),
      StructField("media_features", ArrayType(FloatType, containsNull = false)),
      StructField("media_luma", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // one codec per task; batches keep the call amortized like mapInPandas
      rows.map { r =>
        val (w, h, fmt, feat, lsum) = decode(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq ++ Seq(w, h, fmt, feat.toSeq, lsum))
      }
    }(enc)
  }

  /** Real bilinear resize: decode, scale onto a targetW×targetH raster,
    * re-encode as PNG. Non-image payloads yield empty bytes.
    */
  def resizeImage(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW > 0 && targetH > 0, s"target dims must be positive, got ${targetW}x$targetH")
    decodeImage(bytes) match {
      case Some((img, _)) =>
        val t = img.getType match {
          // palette/bitonal/custom sources re-sample into plain RGB
          case BufferedImage.TYPE_CUSTOM | BufferedImage.TYPE_BYTE_INDEXED |
               BufferedImage.TYPE_BYTE_BINARY => BufferedImage.TYPE_INT_RGB
          case other => other
        }
        val out = new BufferedImage(targetW, targetH, t)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
            RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        encodePng(out)
      case None => Array.emptyByteArray
    }
  }

  /** Deterministic animated GIF: one constant-gray frame per entry of
    * `grays` — the JDK's one real multi-frame container, written through
    * the ImageIO sequence API. Constant frames make palette quantization
    * exact, so decoded per-frame luma sums are arithmetic (gray·w·h).
    */
  def synthGif(width: Int, height: Int, grays: Seq[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive, got ${width}x$height")
    require(grays.nonEmpty, "at least one frame")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      grays.foreach { g =>
        require(g >= 0 && g <= 255, s"gray must be a byte value, got $g")
        val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) { raster.setSample(x, y, 0, g); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL frame extraction for multi-frame image containers (animated GIF;
    * TIFF pages on modern JDKs): decode every `everyNth` stored frame and
    * emit (frame_idx, width, height, luma_sum). This is the frame-sampling
    * path with an actual codec behind it; video CONTAINERS have their own
    * real walk ([[Video.explodeVideoFrames]] over AVI,
    * [[Video.explodeMp4Keyframes]] over MP4), and [[sampleFrames]] remains
    * only as the generic chopper for codec-less payloads.
    */
  def imageFrames(bytes: Array[Byte], everyNth: Int): Seq[(Int, Int, Int, Long)] = {
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    if (bytes == null || bytes.length < 4) return Seq.empty
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Seq.empty
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = r.getNumImages(true)
            (0 until n by everyNth).flatMap { i =>
              // same header-dims guard as decodeImage, per frame
              val (w, h) = (r.getWidth(i).toLong, r.getHeight(i).toLong)
              if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) None
              else {
                val img = r.read(i)
                Some((i, img.getWidth, img.getHeight, lumaStats(img)._2))
              }
            }
          } finally r.dispose()
        }
      } finally iis.close()
    } catch {
      // same totality contract as decodeImage: malformed multi-frame
      // payloads yield no frames, never a task failure
      case scala.util.control.NonFatal(_) => Seq.empty
    }
  }

  private val imageFramesUdf = udf((b: Array[Byte], n: Int) => imageFrames(b, n))

  /** Explode real decoded frames: one row per sampled frame with
    * (frame_idx, frame_width, frame_height, frame_luma).
    */
  def explodeImageFrames(df: DataFrame, binCol: String, everyNth: Int): DataFrame =
    df.withColumn("_f", explode(imageFramesUdf(col(binCol), lit(everyNth))))
      .withColumn("frame_idx", col("_f._1"))
      .withColumn("frame_width", col("_f._2"))
      .withColumn("frame_height", col("_f._3"))
      .withColumn("frame_luma", col("_f._4"))
      .drop("_f")

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

  private val resizeUdf = udf((b: Array[Byte], w: Int, h: Int) => resizeImage(b, w, h))
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

  /** Real figure crop: decode the page image, cut the polygon's pixel bbox
    * out of the raster with `getSubimage`, re-encode the crop as PNG — the
    * reference's crop → store path (multimodal_chunker.py:449-517) with the
    * service call replaced by the JDK codec. Returns (crop_width,
    * crop_height, png_bytes); empty for degenerate boxes or non-images.
    */
  def cropFigure(pageBytes: Array[Byte], poly: Seq[Double],
      pageW: Double, pageH: Double): (Int, Int, Array[Byte]) =
    decodeImage(pageBytes) match {
      case Some((img, _)) =>
        val (x0, y0, x1, y1) = pixelBBox(poly, pageW, pageH, img.getWidth, img.getHeight)
        val cw = x1 - x0
        val ch = y1 - y0
        if (cw <= 0 || ch <= 0) (0, 0, Array.emptyByteArray)
        else (cw, ch, encodePng(img.getSubimage(x0, y0, cw, ch)))
      case None => (0, 0, Array.emptyByteArray)
    }

  private val cropUdf = udf((b: Array[Byte], poly: Seq[Double], w: Double, h: Double) =>
    cropFigure(b, poly, w, h))

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
  def writeFigureBlobs(figures: DataFrame, binCol: String, idCol: String, outDir: String,
      ext: String = ".png"): Unit = {
    val bin = figures.schema.fieldIndex(binCol)
    val idIdx = figures.schema.fieldIndex(idCol)
    // ship the session's Hadoop conf — executor-side credentials and fs
    // implementations come from spark.hadoop.*, not from core-site.xml
    val sconf = graft.core.Fs.serializableConf(figures.sparkSession)
    figures.foreachPartition { rows: Iterator[Row] =>
      val dir = new org.apache.hadoop.fs.Path(outDir)
      val fs = dir.getFileSystem(sconf.value)
      fs.mkdirs(dir)
      rows.foreach { r =>
        val out = fs.create(
          new org.apache.hadoop.fs.Path(dir, r.getString(idIdx) + ext), true)
        try out.write(r.getAs[Array[Byte]](bin)) finally out.close()
      }
    }
  }
}
