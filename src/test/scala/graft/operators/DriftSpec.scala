package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The drift-monitor stack: the cheap known-assignment stats path equals
  * the search path, monitored appends write/return exactly what the
  * unmonitored ones do plus a sane report, the fused single-assignment
  * IVF append matches the plain one, and a stale drift reference cannot
  * survive an in-place artifact rewrite.
  */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val emb = graft.Tables.load(spark, graft.TestSpark.sf, "embeddings")
  private lazy val ivf = Similarity.buildIvf(spark, emb, "vec_id", "embedding",
    nCells = 8, iters = 2)

  test("driftStatsAssigned over the index's assignments ≡ driftStats(unit=false)") {
    val a = Similarity.driftStatsAssigned(spark, ivf.assignments,
      "cell", "vec", ivf.centroids)
    val b = Similarity.driftStats(spark,
      ivf.assignments.select($"vec".as("v")), "v", ivf.centroids, unit = false)
    assert(a.n == b.n)
    assert(a.cellMass.toSeq == b.cellMass.toSeq,
      "the known cell IS the nearest cell — masses must agree exactly")
    assert(math.abs(a.meanResidNorm - b.meanResidNorm) < 1e-12)
    assert(math.abs(a.p95ResidNorm - b.p95ResidNorm) < 1e-12)
  }

  test("the training set scores clean against its own reference") {
    val ref = Similarity.driftStatsAssigned(spark, ivf.assignments,
      "cell", "vec", ivf.centroids)
    val r = Similarity.driftReport(spark, emb.select($"embedding"),
      "embedding", ivf.centroids, ref, unit = false)
    assert(!r.drifted)
    assert(math.abs(r.residRatio - 1.0) < 1e-9, "same data, same mean residual")
    assert(r.massKl < 1e-6, "same data routes identically")
  }

  test("an empty batch reports clean with n=0") {
    val ref = Similarity.driftStatsAssigned(spark, ivf.assignments,
      "cell", "vec", ivf.centroids)
    val r = Similarity.driftReport(spark,
      emb.filter($"vec_id" < 0).select($"embedding"), "embedding",
      ivf.centroids, ref, unit = false)
    assert(r.n == 0 && !r.drifted && r.residRatio == 1.0 && r.massKl == 0.0)
  }

  test("monitored graph append ≡ unmonitored append + a sane report") {
    val existing = GraphAnn.buildGraphPerCell(spark,
      ivf.assignments.filter($"id" % 2 === 0), m = 4, efConstruction = 16)
      .localCheckpoint(true)
    val batch = emb.filter($"vec_id" % 2 === 1)
      .select($"vec_id", $"embedding")
    val ref = Similarity.driftStatsAssigned(spark, ivf.assignments,
      "cell", "vec", ivf.centroids)
    val plain = GraphAnn.appendGraphCells(existing, batch, "vec_id",
      "embedding", ivf.centroids, m = 4, efConstruction = 16)
    val (monitored, report) = GraphAnn.appendGraphCellsMonitored(existing,
      batch, "vec_id", "embedding", ivf.centroids, ref, m = 4,
      efConstruction = 16)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"part", $"id", $"level", $"seg")
    assert(norm(monitored).exceptAll(norm(plain)).isEmpty &&
      norm(plain).exceptAll(norm(monitored)).isEmpty,
      "the monitor must not change what the append builds")
    assert(report.n == batch.count())
    assert(!report.drifted, "an in-distribution half of the corpus is clean")
  }

  test("appendToIvfMonitored writes exactly what appendToIvf writes") {
    val d1 = java.nio.file.Files.createTempDirectory("graft-drift1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-drift2").toString
    Similarity.writeIvf(ivf, d1)
    Similarity.writeIvf(ivf, d2)
    val batch = emb.filter($"vec_id" % 3 === 0)
      .select(($"vec_id" + 50000L).as("vec_id"), $"embedding")
    Similarity.appendToIvf(spark, d1, batch, "vec_id", "embedding")
    val r = Similarity.appendToIvfMonitored(spark, d2, batch, "vec_id", "embedding")
    assert(!r.drifted)
    def cells(dir: String) = spark.read.parquet(s"$dir/assignments")
      .select($"id", $"cell").collect().map(x => (x.getLong(0), x.getInt(1)))
      .sortBy(_._1).toSeq
    assert(cells(d1) == cells(d2),
      "the fused single-assignment write must place every row in the same cell")
    assert(spark.read.parquet(s"$d2/drift_log").count() == 1)
  }

  test("graph-tier monitored appends log durably to a serving root (logTo)") {
    val root = java.nio.file.Files.createTempDirectory("graft-driftlog").toString
    val unified = Seq("batch_id", "n", "mean_rn", "p95_rn", "resid_ratio",
      "mass_kl", "drifted")
    val existing = GraphAnn.buildGraphPerCell(spark,
      ivf.assignments.filter($"id" % 2 === 0), m = 4, efConstruction = 16)
      .localCheckpoint(true)
    val batch = emb.filter($"vec_id" % 2 === 1).select($"vec_id", $"embedding")
    val ref = Similarity.driftStatsAssigned(spark, ivf.assignments,
      "cell", "vec", ivf.centroids)
    // float leg: exactly one row per monitored append, the unified schema
    val (_, r1) = GraphAnn.appendGraphCellsMonitored(existing, batch,
      "vec_id", "embedding", ivf.centroids, ref, m = 4, efConstruction = 16,
      logTo = Some(root))
    val log1 = spark.read.parquet(s"$root/drift_log")
    assert(log1.columns.toSeq == unified, log1.columns.mkString(","))
    val row = log1.collect()
    assert(row.length == 1, "one monitored append = one log row")
    assert(row(0).isNullAt(0), "a batch leg logs a null batch_id")
    assert(row(0).getLong(1) == r1.n &&
      row(0).getBoolean(6) == r1.drifted)
    // history accumulates: a second append is a second row
    GraphAnn.appendGraphCellsMonitored(existing, batch, "vec_id",
      "embedding", ivf.centroids, ref, m = 4, efConstruction = 16,
      logTo = Some(root))
    assert(spark.read.parquet(s"$root/drift_log").count() == 2)
    // PQ leg: same schema, same one-row contract, on its own root
    val root2 = java.nio.file.Files.createTempDirectory("graft-driftlog2").toString
    val pq = Similarity.buildIvfPq(spark, emb.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", nCells = 8, subspaces = 8, codesPerSub = 8,
      ivfIters = 1, pqIters = 1)
    val pqNodes = GraphAnn.buildGraphPerCellPq(spark,
      emb.filter($"vec_id" % 2 === 0), "vec_id", "embedding", pq, m = 4,
      efConstruction = 16).localCheckpoint(true)
    val refPq = Similarity.driftStats(spark,
      emb.filter($"vec_id" % 2 === 0).select($"embedding"), "embedding",
      pq.centroids, unit = true)
    val (_, r2) = GraphAnn.appendGraphCellsPqMonitored(pqNodes, batch,
      "vec_id", "embedding", pq, refPq, m = 4, efConstruction = 16,
      logTo = Some(root2))
    val log2 = spark.read.parquet(s"$root2/drift_log")
    assert(log2.columns.toSeq == unified, log2.columns.mkString(","))
    assert(log2.count() == 1)
    assert(log2.head().getLong(1) == r2.n)
    // default stays DataFrame-in/DataFrame-out: a logTo-less append on
    // the SAME roots adds no drift_log row anywhere
    GraphAnn.appendGraphCellsMonitored(existing, batch, "vec_id",
      "embedding", ivf.centroids, ref, m = 4, efConstruction = 16)
    GraphAnn.appendGraphCellsPqMonitored(pqNodes, batch, "vec_id",
      "embedding", pq, refPq, m = 4, efConstruction = 16)
    assert(spark.read.parquet(s"$root/drift_log").count() == 2)
    assert(spark.read.parquet(s"$root2/drift_log").count() == 1)
  }

  test("null-vector rows are dropped by both IVF append legs, not crashed on") {
    val d1 = java.nio.file.Files.createTempDirectory("graft-driftn1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-driftn2").toString
    Similarity.writeIvf(ivf, d1)
    Similarity.writeIvf(ivf, d2)
    val good = emb.filter($"vec_id" % 7 === 0)
      .select(($"vec_id" + 90000L).as("vec_id"), $"embedding")
    val batch = good.unionByName(
      good.limit(3).select(($"vec_id" + 1000000L).as("vec_id"),
        lit(null).cast("array<float>").as("embedding")))
    val before = spark.read.parquet(s"$d1/assignments").count()
    Similarity.appendToIvf(spark, d1, batch, "vec_id", "embedding")
    val r = Similarity.appendToIvfMonitored(spark, d2, batch, "vec_id", "embedding")
    val nGood = good.count()
    assert(spark.read.parquet(s"$d1/assignments").count() == before + nGood,
      "unmonitored append lands exactly the non-null rows")
    assert(spark.read.parquet(s"$d2/assignments")
      .filter($"id" >= 1000000L).isEmpty,
      "null-vector rows never reach the assignments table")
    assert(r.n == nGood, "the monitor counts exactly the rows the append writes")
    assert(!r.drifted)
  }

  test("writeIvfPq without a drift reference clears a stale one") {
    val pq = Similarity.buildIvfPq(spark, emb, "vec_id", "embedding",
      nCells = 8, subspaces = 8, codesPerSub = 8, ivfIters = 1, pqIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-drift3").toString + "/art"
    val ref = Similarity.driftStats(spark, emb.select($"embedding"),
      "embedding", pq.centroids, unit = true)
    Similarity.writeIvfPq(pq, dir, driftStats = Some(ref))
    assert(Similarity.readIvfPq(spark, dir).driftStats.isDefined)
    // in-place rewrite WITHOUT a reference: the old one must not survive
    // to mis-score batches against superseded centroids
    Similarity.writeIvfPq(pq, dir)
    assert(Similarity.readIvfPq(spark, dir).driftStats.isEmpty)
  }
}
