package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphAnn, Similarity}
import graft.pipeline.PartitionedUpsert

/** The ST8 scheduler leg: land-then-log pending state, the one-tick
  * drift response, window cleanup, and the crash-replay idempotence that
  * makes the cron-shaped loop safe.
  */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val emb =
    graft.Tables.load(spark, graft.TestSpark.sf, "embeddings")
  private lazy val base = emb.filter($"vec_id" % 2 === 0)
    .select($"vec_id", $"embedding").localCheckpoint(true)
  private def drifted = emb.filter($"vec_id" % 8 === 1)
    .select(($"vec_id" + 900000L).as("vec_id"),
      expr("transform(embedding, x -> x + 0.5f)").as("embedding"))
  private def inDist = emb.filter($"vec_id" % 8 === 3)
    .select(($"vec_id" + 800000L).as("vec_id"), $"embedding")

  /** Stage one parquet file per df with ascending mtimes (one
    * micro-batch each under maxFilesPerTrigger=1).
    */
  private def stageFiles(dir: String,
      dfs: Seq[org.apache.spark.sql.DataFrame]): Unit = {
    Files.createDirectories(java.nio.file.Paths.get(dir))
    dfs.zipWithIndex.foreach { case (df, i) =>
      val scratch = Files.createTempDirectory("graft-mt-part")
      df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val ls = Files.list(scratch)
      val part =
        try ls.filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally ls.close()
      val dst = java.nio.file.Paths.get(dir, s"b$i.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime
        .fromMillis(1700000000000L + i * 3600000L))
    }
  }

  /** Base deployment: IVF-PQ + graph + reference published under a fresh
    * root; returns (root, ix, ref, v0).
    */
  private def publishBase(): (String, Similarity.IvfPqIndex,
      Similarity.DriftStats, String) = {
    val ix = Similarity.buildIvfPq(spark, base, "vec_id", "embedding",
      nCells = 8, subspaces = 8, codesPerSub = 8, ivfIters = 2, pqIters = 1)
    val nodes = GraphAnn.buildGraphPerCellPq(spark, base, "vec_id",
      "embedding", ix, m = 4, efConstruction = 16)
    val ref = Similarity.driftStats(spark, base.select($"embedding"),
      "embedding", ix.centroids, unit = true)
    val root = Files.createTempDirectory("graft-mt-root").toString
    val v0 = GraphAnn.publishPqServing(nodes, ix, root,
      Some(GraphAnn.pqClumpBound(nodes)), Some(ref))
    (root, ix, ref, v0)
  }

  test("pruneDriftLog: window rows drop, null-id and later rows stay") {
    val dir = Files.createTempDirectory("graft-mt-log").toString + "/log"
    def rep(d: Boolean) = Similarity.DriftReport(4, 1.0, 1.0, 1.0, 0.1, d)
    Similarity.appendDriftLog(spark, dir, rep(false), Some(0L))
    Similarity.appendDriftLog(spark, dir, rep(true), Some(1L))
    Similarity.appendDriftLog(spark, dir, rep(false), None)
    Similarity.appendDriftLog(spark, dir, rep(false), Some(2L))
    assert(Similarity.pruneDriftLog(spark, dir, 1L) == 2L)
    val left = spark.read.parquet(dir).select($"batch_id").collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq
    assert(left == Seq(-1L, 2L), s"null-id and post-window rows stay: $left")
    assert(Similarity.pruneDriftLog(spark, dir, 99L) == 1L)
    assert(Similarity.pruneDriftLog(spark, dir, 99L) == 0L, "idempotent")
  }

  test("ingest lands a drifted batch's rows BEFORE logging the trip; clean batches land nothing") {
    val (root, ix, ref, _) = publishBase()
    val run = Files.createTempDirectory("graft-mt-ingest").toString
    stageFiles(s"$run/vecs", Seq(inDist, drifted))
    StreamingIngest.runAvailableNowNearDupEmbeddings(spark, s"$run/vecs",
      s"$run/index", s"$run/ckpt", minCosine = 0.4, bands = 8,
      rowsPerBand = 4, maxFilesPerTrigger = Some(1), buckets = 8,
      driftMonitor = Some(StreamingIngest.DriftMonitorConfig(
        ix.centroids, ref)))
    val ids = Maintenance.pendingDriftBatchIds(spark, s"$run/index")
    assert(ids.size == 1, s"exactly the planted batch pends: $ids")
    assert(!graft.core.Fs.exists(spark,
      s"$run/index/drift_batches/batch_id=0"),
      "the clean batch lands no pending rows")
    val landed = spark.read
      .parquet(s"$run/index/drift_batches/batch_id=${ids.head}")
    assert(landed.count() == drifted.count(),
      "the pending dir holds the full drifted batch")
    assert(landed.columns.toSeq == Seq("id", "vec"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(run))
  }

  test("one maintenance tick: rebuild fires, window prunes, pending clears; second tick no-op") {
    val (root, ix, ref, v0) = publishBase()
    val run = Files.createTempDirectory("graft-mt-tick").toString
    stageFiles(s"$run/vecs", Seq(inDist, drifted))
    StreamingIngest.runAvailableNowNearDupEmbeddings(spark, s"$run/vecs",
      s"$run/index", s"$run/ckpt", minCosine = 0.4, bands = 8,
      rowsPerBand = 4, maxFilesPerTrigger = Some(1), buckets = 8,
      driftMonitor = Some(StreamingIngest.DriftMonitorConfig(
        ix.centroids, ref)))
    val corpus = base.unionByName(drifted).localCheckpoint(true)
    val tick1 = Maintenance.runDriftMaintenance(spark, s"$run/index", root,
      corpus, "vec_id", "embedding", splitFactor = 2, ivfIters = 2,
      m = 4, efConstruction = 16)
    assert(tick1.rebuild.nonEmpty, "the planted mode must trigger a rebuild")
    val res = tick1.rebuild.get
    assert(res.version != v0)
    assert(graft.pipeline.VersionedIndex.currentVersion(root)
      .contains(res.version), "one-flip republish")
    // window cleared: no pending ids, processed log rows pruned
    assert(Maintenance.pendingDriftBatchIds(spark, s"$run/index").isEmpty)
    assert(tick1.logRowsPruned >= 2)
    assert(spark.read.parquet(s"$run/index/drift_log")
      .filter($"batch_id" <= tick1.pendingBatchIds.max).isEmpty)
    // the published reference covers every served row (the r17 remainder
    // fold): its n equals the coded rowcount
    val art = Similarity.readIvfPq(spark, s"$root/${res.version}/artifacts")
    assert(art.driftStats.get.n == art.index.coded.count(),
      "reference.n must track the served corpus")
    // second tick: nothing pending, no flip
    val tick2 = Maintenance.runDriftMaintenance(spark, s"$run/index", root,
      corpus, "vec_id", "embedding")
    assert(tick2.pendingBatchIds.isEmpty && tick2.rebuild.isEmpty)
    assert(graft.pipeline.VersionedIndex.currentVersion(root)
      .contains(res.version))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(run))
  }

  test("a crash between prune and dir-delete is adopted by the NEXT tick, pending or not") {
    val run = Files.createTempDirectory("graft-mt-orphan").toString
    val log = s"$run/index/drift_log"
    // the crash window's on-disk shape: the tick pruned the log (and
    // advanced the durable watermark) but died before deleting the dir
    Similarity.appendDriftLog(spark, log,
      Similarity.DriftReport(4, 1.0, 1.0, 2.0, 2.0, drifted = true),
      Some(3L))
    assert(Similarity.pruneDriftLog(spark, log, 3L) == 1L)
    drifted.limit(4).select($"vec_id".cast("long").as("id"),
        $"embedding".as("vec"))
      .write.mode("overwrite")
      .parquet(s"$run/index/drift_batches/batch_id=3")
    // a stray unparseable dir must be ignored, not crash the tick
    Files.createDirectories(java.nio.file.Paths.get(
      s"$run/index/drift_batches/batch_id=5.bak"))
    val tick = Maintenance.runDriftMaintenance(spark, s"$run/index",
      s"$run/no-root", base, "vec_id", "embedding")
    assert(tick.pendingBatchIds.isEmpty && tick.rebuild.isEmpty)
    assert(!graft.core.Fs.exists(spark,
      s"$run/index/drift_batches/batch_id=3"),
      "the empty tick must adopt the pruned-window orphan")
    assert(graft.core.Fs.exists(spark,
      s"$run/index/drift_batches/batch_id=5.bak"),
      "unparseable names are ignored, not deleted or fatal")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(run))
  }

  test("crash after publish, BEFORE prune: the pending replay is absorbed, no second flip") {
    // construct the exact crash-window state: the rebuild PUBLISHED but
    // the tick died before pruning — log row + landed dir present,
    // watermark not advanced, every landed id already served
    val (root, ix, ref, _) = publishBase()
    val run = Files.createTempDirectory("graft-mt-crash").toString
    val batch = drifted.localCheckpoint(true)
    val corpus = base.unionByName(batch).localCheckpoint(true)
    val res = graft.operators.GraphAnn.rebuildDriftedPqServing(spark, root,
      corpus, "vec_id", "embedding", batch, "vec_id", "embedding",
      splitFactor = 2, ivfIters = 2, m = 4, efConstruction = 16)
    assert(res.nonEmpty, "fixture: the planted mode must rebuild")
    val v1 = res.get.version
    batch.select($"vec_id".cast("long").as("id"), $"embedding".as("vec"))
      .write.mode("overwrite")
      .parquet(s"$run/index/drift_batches/batch_id=7")
    Similarity.appendDriftLog(spark, s"$run/index/drift_log",
      Similarity.DriftReport(4, 1.0, 1.0, 2.0, 2.0, drifted = true),
      Some(7L))
    val replay = Maintenance.runDriftMaintenance(spark, s"$run/index", root,
      corpus, "vec_id", "embedding", splitFactor = 2, ivfIters = 2,
      m = 4, efConstruction = 16)
    assert(replay.pendingBatchIds == Seq(7L), "the replayed batch pends")
    assert(replay.rebuild.isEmpty,
      "already-served rows drop in novelPending — nothing to rebuild")
    assert(Maintenance.pendingDriftBatchIds(spark, s"$run/index").isEmpty,
      "the replay still clears the pending state")
    assert(graft.pipeline.VersionedIndex.currentVersion(root).contains(v1),
      "no second flip")
    // crash AFTER prune instead: the watermark sweep adopts a re-landed
    // dir at the next tick's start (covered by the orphan test above);
    // re-landing the same id below the watermark is swept, not re-pended
    batch.select($"vec_id".cast("long").as("id"), $"embedding".as("vec"))
      .write.mode("overwrite")
      .parquet(s"$run/index/drift_batches/batch_id=7")
    val tick3 = Maintenance.runDriftMaintenance(spark, s"$run/index", root,
      corpus, "vec_id", "embedding")
    assert(tick3.pendingBatchIds.isEmpty && tick3.rebuild.isEmpty)
    assert(!graft.core.Fs.exists(spark,
      s"$run/index/drift_batches/batch_id=7"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(run))
  }
}
