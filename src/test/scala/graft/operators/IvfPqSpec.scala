package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

/** IVF-PQ on the real embeddings table: index geometry, the cosine
  * decomposition (cell constant + residual ADC), residual compressibility,
  * nprobe monotonicity, and full-probe agreement with flat search.
  */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings")
  private lazy val probe = emb.filter($"vec_id" === 1L)
    .select($"embedding").head().getSeq[Float](0).toArray
  private lazy val index = Similarity.buildIvfPq(spark, emb, "vec_id", "embedding",
    nCells = 16, subspaces = 8, codesPerSub = 16, ivfIters = 2, pqIters = 2)

  private def l2unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n == 0) v.map(_ => 0f) else v.map(x => (x / n).toFloat)
  }

  test("index geometry: every vector coded, 8-byte codes, valid cells") {
    val rows = index.coded.collect()
    assert(rows.length == emb.count())
    val cellIds = index.centroids.map(_._1).toSet
    rows.foreach { r =>
      assert(cellIds.contains(r.getInt(r.fieldIndex("cell"))))
      assert(r.getAs[Array[Byte]]("pq_codes").length == 8)
    }
  }

  test("cell residuals beat the single-centroid residual") {
    // the margin residual coding spends its byte budget on: distance to
    // the OWN cell's centroid must beat distance to one global centroid
    // (how much depends on how clustered the data is — the synthetic
    // embeddings are near-uniform on the sphere, so the test is
    // comparative, not an absolute norm bound)
    val centroidOf = index.centroids.toMap
    val unitVecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> l2unit(r.getSeq[Float](1).toArray)).toMap
    val cells = index.coded.select($"id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dim = unitVecs.head._2.length
    val global = new Array[Double](dim)
    unitVecs.values.foreach(u => (0 until dim).foreach(i => global(i) += u(i)))
    (0 until dim).foreach(i => global(i) /= unitVecs.size)
    def dist(u: Array[Float], c: Int => Double): Double =
      math.sqrt((0 until dim).map(i => (u(i) - c(i)) * (u(i) - c(i))).sum)
    val meanResid = unitVecs.map { case (id, u) =>
      val c = centroidOf(cells(id)); dist(u, c(_).toDouble)
    }.sum / unitVecs.size
    val meanGlobal = unitVecs.values.map(u => dist(u, global)).sum / unitVecs.size
    assert(meanResid <= meanGlobal + 1e-9,
      s"cell residual $meanResid worse than global $meanGlobal")
  }

  test("recall is monotone in nprobe and hits brute force at full probe") {
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", probe, 10)
      .select($"vec_id").as[Long].collect().toSet
    val recalls = Seq(2, 6, 16).map { np =>
      val got = Similarity.searchIvfPq(spark, index, emb, "vec_id", "embedding",
        probe, nprobe = np, k = 10).select($"vec_id").as[Long].collect().toSet
      (got & exact).size
    }
    assert(recalls(0) <= recalls(1) + 1 && recalls(1) <= recalls(2) + 1,
      s"recall should not collapse as nprobe grows: $recalls")
    assert(recalls(2) >= 6, s"full-probe recall ${recalls(2)} too low")
    // the true nearest neighbour (the probe itself) always survives
    val top = Similarity.searchIvfPq(spark, index, emb, "vec_id", "embedding",
      probe, nprobe = 16, k = 1).select($"vec_id").as[Long].head()
    assert(top == 1L)
  }

  test("stage 1 scans only the probed cells") {
    val cells = Similarity.probedCells(index, probe, nprobe = 3)
    assert(cells.length == 3)
    val scanned = index.coded.filter($"cell".isin(cells: _*)).count()
    assert(scanned < index.coded.count(),
      "probed cells must bound the code scan")
  }

  test("deterministic: rebuilding the index reproduces codes and results") {
    val again = Similarity.buildIvfPq(spark, emb, "vec_id", "embedding",
      nCells = 16, subspaces = 8, codesPerSub = 16, ivfIters = 2, pqIters = 2)
    val a = index.coded.select($"id", $"cell", hex($"pq_codes").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(_._1)
    val b = again.coded.select($"id", $"cell", hex($"pq_codes").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("batch search is row-identical to the single-probe path") {
    val probes = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val batch = Similarity.searchIvfPqBatch(spark, index, emb, "vec_id",
        "embedding", probes, "probe_id", "probe_vec", nprobe = 4, k = 5)
      .select($"probe_id", $"id", round($"sim", 6).as("sim"), $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val singles = (0L until 10L).flatMap { q =>
      val pv = emb.filter($"vec_id" === q)
        .select($"embedding").head().getSeq[Float](0).toArray
      Similarity.searchIvfPq(spark, index, emb, "vec_id", "embedding",
          pv, nprobe = 4, k = 5)
        .select($"vec_id", round($"sim", 6).as("sim"))
        .collect().zipWithIndex
        .map { case (r, i) => (q, r.getLong(0), r.getDouble(1), i + 1) }
    }.sortBy(t => (t._1, t._4))
    assert(batch.length == singles.length)
    assert(batch.sameElements(singles))
  }

  test("writeIvfPq/readIvfPq round-trips every artifact bit-exactly") {
    val base = java.nio.file.Files.createTempDirectory("graft-ivfpq-rt").toString
    Similarity.writeIvfPq(index, s"$base/art", clumpBound = Some(7))
    val art = Similarity.readIvfPq(spark, s"$base/art")
    assert(art.clumpBound.contains(7), "manifest must carry the clump bound")
    assert(art.index.centroids.length == index.centroids.length)
    art.index.centroids.zip(index.centroids).foreach { case ((ci, a), (cj, b)) =>
      assert(ci == cj, "centroid order must be the build order (cell asc)")
      assert(java.util.Arrays.equals(a, b), s"centroid $ci must round-trip bit-exactly")
    }
    assert(art.index.book.subspaces == index.book.subspaces)
    assert(art.index.book.subDim == index.book.subDim)
    art.index.book.centroids.zip(index.book.centroids).zipWithIndex.foreach {
      case ((sa, sb), sc) =>
        assert(sa.length == sb.length)
        sa.zip(sb).foreach { case (x, y) =>
          assert(java.util.Arrays.equals(x, y), s"codebook sub $sc must round-trip") }
    }
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"cell", $"pq_codes")
    assert(norm(art.index.coded).exceptAll(norm(index.coded)).isEmpty &&
      norm(index.coded).exceptAll(norm(art.index.coded)).isEmpty,
      "coded table must round-trip row-identically")
    // an unset clump bound round-trips as None, not 0
    Similarity.writeIvfPq(index, s"$base/art2")
    assert(Similarity.readIvfPq(spark, s"$base/art2").clumpBound.isEmpty)
  }
}
