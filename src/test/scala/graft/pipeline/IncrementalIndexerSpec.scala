package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.TestSpark

class IncrementalIndexerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(): (String, String) = {
    val d = Files.createTempDirectory("graft-incr")
    (d.resolve("index").toString, d.resolve("state").toString)
  }

  private def docs(texts: Map[Long, String]) = {
    import spark.implicits._
    texts.toSeq.map { case (id, t) => (id, t, s"src${id % 3}", "en") }
      .toDF("doc_id", "text", "source", "lang")
  }

  private val base = Map(
    1L -> ("alpha beta gamma " * 20).trim,
    2L -> ("delta epsilon zeta " * 15).trim,
    3L -> ("eta theta iota " * 10).trim)

  test("run 1 processes everything; unchanged run 2 processes nothing (§5.4)") {
    val (indexDir, stateDir) = tmp()
    val r1 = IncrementalIndexer.runOnce(spark, docs(base), indexDir, stateDir, "run1")
    assert(r1.processed == 3 && r1.skippedNoChange == 0)
    assert(r1.chunksWritten > 0 && r1.indexSize == r1.chunksWritten)

    val r2 = IncrementalIndexer.runOnce(spark, docs(base), indexDir, stateDir, "run2")
    assert(r2.processed == 0, "unchanged docs must not re-process (the cost lever)")
    assert(r2.skippedNoChange == 3)
    assert(r2.chunksWritten == 0)
    assert(r2.indexSize == r1.indexSize)
  }

  test("touching one doc replaces exactly its chunks") {
    import spark.implicits._
    val (indexDir, stateDir) = tmp()
    IncrementalIndexer.runOnce(spark, docs(base), indexDir, stateDir, "run1")
    val before = spark.read.parquet(indexDir)
      .select("id", "parent_id").as[(String, Long)].collect().toSet

    val touched = base + (2L -> ("changed words entirely " * 12).trim)
    val r2 = IncrementalIndexer.runOnce(spark, docs(touched), indexDir, stateDir, "run2")
    assert(r2.processed == 1 && r2.skippedNoChange == 2)
    val after = spark.read.parquet(indexDir)
      .select("id", "parent_id").as[(String, Long)].collect().toSet
    // parents 1 and 3 untouched bit-for-bit (same keys)
    assert(before.filter(_._2 != 2L) == after.filter(_._2 != 2L))
    assert(after.exists(_._2 == 2L))
  }

  test("removing a doc purges its chunks (J2)") {
    val (indexDir, stateDir) = tmp()
    IncrementalIndexer.runOnce(spark, docs(base), indexDir, stateDir, "run1")
    val r2 = IncrementalIndexer.runOnce(spark, docs(base - 3L), indexDir, stateDir, "run2")
    assert(r2.purgedParents == 1)
    val parents = spark.read.parquet(indexDir).select("parent_id").distinct().count()
    assert(parents == 2)
  }

  test("blocked parents are skipped until unblocked (F3)") {
    val (indexDir, stateDir) = tmp()
    IncrementalIndexer.runOnce(spark, docs(base), indexDir, stateDir, "run1")
    IncrementalIndexer.setBlocked(spark, stateDir, 1L, blocked = true)
    val touched = base + (1L -> "totally new content for doc one")
    val r2 = IncrementalIndexer.runOnce(spark, docs(touched), indexDir, stateDir, "run2")
    assert(r2.processed == 0, "blocked doc must not process even when changed")
    assert(r2.skippedBlocked == 1)
    IncrementalIndexer.setBlocked(spark, stateDir, 1L, blocked = false)
    val r3 = IncrementalIndexer.runOnce(spark, docs(touched), indexDir, stateDir, "run3")
    assert(r3.processed == 1)
  }

  test("index table is partitioned by source (partition pruning at scale)") {
    val (indexDir, stateDir) = tmp()
    IncrementalIndexer.runOnce(spark, docs(base), indexDir, stateDir, "run1")
    val dirs = new java.io.File(indexDir).listFiles().map(_.getName).filter(_.startsWith("source="))
    assert(dirs.nonEmpty, "expected hive-style source= partitions")
  }

  test("the embedder runs exactly once per chunk per run (no double-execute)") {
    val (indexDir, stateDir) = tmp()
    // accumulator-backed decorator: counts texts embedded across executors
    val calls = spark.sparkContext.longAccumulator("embedded-texts")
    class CountingEmbedder extends graft.services.Embedder {
      private val inner = new graft.services.HashingEmbedder(64)
      override def dim: Int = inner.dim
      override def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = {
        val batch = texts.toSeq
        calls.add(batch.size)
        inner.embedBatch(batch.iterator)
      }
    }
    val r1 = IncrementalIndexer.runOnce(spark, docs(base), indexDir, stateDir, "run1",
      embedder = new CountingEmbedder)
    assert(r1.chunksWritten > 0)
    assert(calls.value == r1.chunksWritten,
      s"embedder saw ${calls.value} texts for ${r1.chunksWritten} chunks — " +
        "the chunk+embed pipeline executed more than once")

    calls.reset()
    val touched = base + (1L -> ("different content now " * 10).trim)
    val r2 = IncrementalIndexer.runOnce(spark, docs(touched), indexDir, stateDir, "run2",
      embedder = new CountingEmbedder)
    assert(calls.value == r2.chunksWritten,
      s"incremental run embedded ${calls.value} texts for ${r2.chunksWritten} chunks")
  }

  test("post-purge consistency check: leaked parents surface, clean runs are empty") {
    val (indexDir, stateDir) = tmp()
    IncrementalIndexer.runOnce(spark, docs(base), indexDir, stateDir, "r1")
    // all parents present → no leaks
    import spark.implicits._
    val current = base.keys.toSeq.toDF("parent_id")
    assert(IncrementalIndexer.leakedParents(spark, indexDir, current).isEmpty)
    // pretend doc 3 was removed from the source WITHOUT a purge run —
    // the consistency check must name it
    val shrunk = Seq(1L, 2L).toDF("parent_id")
    assert(IncrementalIndexer.leakedParents(spark, indexDir, shrunk).toSeq == Seq(3L))
    // after a real incremental run over the shrunk listing, the purge
    // happens and the check is clean again (blob_storage_indexer.py:1761+)
    IncrementalIndexer.runOnce(spark, docs(base - 3L), indexDir, stateDir, "r2")
    assert(IncrementalIndexer.leakedParents(spark, indexDir, shrunk).isEmpty)
  }

  test("run log retention keeps the newest maxRunFiles summaries (admin.py:202-228)") {
    val dir = Files.createTempDirectory("graft-runlog").toString
    def summary(i: Int) = IncrementalIndexer.RunSummary(
      f"run$i%03d", 3, 3, 0, 0, 0, 10, 10)
    (1 to 7).foreach { i =>
      IncrementalIndexer.writeRunLog(summary(i), dir, maxRunFiles = 5)
      // distinct mtimes so retention order is unambiguous
      val f = java.nio.file.Paths.get(dir, "runs", f"run$i%03d.json")
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    }
    val kept = java.nio.file.Files.list(java.nio.file.Paths.get(dir, "runs"))
    import scala.jdk.CollectionConverters._
    val names = try kept.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
      finally kept.close()
    assert(names == Seq("run003.json", "run004.json", "run005.json",
      "run006.json", "run007.json"))
    // the surviving payloads are the reference's run-summary JSON (S12 scans them)
    val one = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "runs", "run007.json"))
    assert(one.contains("\"runId\":\"run007\"") && one.contains("\"chunksWritten\":10"))
  }
}
