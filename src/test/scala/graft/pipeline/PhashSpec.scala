package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** DCT perceptual hash (m5): scale invariance, re-encode robustness,
  * seed discrimination, and totality over non-image payloads.
  */
class PhashSpec extends AnyFunSuite {
  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
  private def hash(b: Array[Byte]): Long = Multimodal.phash64(b).get

  test("same content at different pixel sizes hashes within the blocking radius") {
    val sizes = Seq((48, 48), (48, 80), (64, 64), (80, 48), (96, 96), (33, 57))
    for (seed <- 0L until 10L) {
      val hs = sizes.map { case (w, h) => hash(Multimodal.spectralPng(seed, w, h)) }
      val maxD = (for (a <- hs; b <- hs) yield ham(a, b)).max
      assert(maxD <= 3, s"seed $seed spread $maxD bits across sizes")
    }
  }

  test("different seeds stay far apart at every size") {
    val hs = (0L until 25L).map(s => hash(Multimodal.spectralPng(s, 64, 64)))
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(ham(hs(i), hs(j)) >= 12, s"seeds $i/$j only ${ham(hs(i), hs(j))} apart")
  }

  test("a lossy JPEG re-encode of the same raster keeps the hash close") {
    for (seed <- 0L until 5L) {
      val png = Multimodal.spectralPng(seed, 64, 64)
      val img = Multimodal.decodeImage(png).get._1
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val jpg = bos.toByteArray
      assert(Multimodal.decodeImage(jpg).get._2 == "jpeg")
      assert(ham(hash(png), hash(jpg)) <= 3, s"seed $seed drifted past re-encode")
    }
  }

  test("structured vs constant images differ; constant image still hashes") {
    // a constant raster has zero AC energy — the hash is all-zeros, far
    // from any spectral pattern's ~32 set bits
    val flat = hash(Multimodal.constPng(64, 64, 128))
    assert(flat == 0L)
    assert(ham(flat, hash(Multimodal.spectralPng(3L, 64, 64))) >= 20)
  }

  test("non-image payloads return None") {
    assert(Multimodal.phash64("not an image".getBytes).isEmpty)
    assert(Multimodal.phash64(Array.emptyByteArray).isEmpty)
    assert(Multimodal.phash64(null).isEmpty)
  }

  test("images smaller than the 32-grid still hash deterministically") {
    val a = hash(Multimodal.spectralPng(7L, 16, 16))
    val b = hash(Multimodal.spectralPng(7L, 16, 16))
    assert(a == b)
  }
}
