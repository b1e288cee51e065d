package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.PartitionedUpsert

/** Continuous paragraph-dedup ingest: the index grows per batch, duplicate
  * paragraphs across batches are dropped, and a replayed batch is a no-op.
  */
class StreamingIngestSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val paras = split(col("text"), "\\|")

  private def writeBatch(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir)

  test("index accumulates novel paragraphs across micro-batches; dups drop") {
    val root = Files.createTempDirectory("graft-ingest").toString
    val docs = s"$root/docs"; val index = s"$root/index"; val ckpt = s"$root/ckpt"

    writeBatch(docs, Seq((1L, "p1|p2"), (2L, "p2|p3")))
    StreamingIngest.runAvailableNow(spark, docs, index, ckpt, paras, 1000L)
    val after1 = PartitionedUpsert.read(spark, index)
      .select($"p_text", $"owner_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after1 == Map("p1" -> 1L, "p2" -> 1L, "p3" -> 2L),
      "batch 1: three distinct paragraphs, first-occurrence owners")

    // batch 2: one known paragraph, one novel
    writeBatch(docs, Seq((3L, "p2|p4")))
    StreamingIngest.runAvailableNow(spark, docs, index, ckpt, paras, 1000L)
    val after2 = PartitionedUpsert.read(spark, index)
      .select($"p_text", $"owner_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after2 == Map("p1" -> 1L, "p2" -> 1L, "p3" -> 2L, "p4" -> 3L),
      "batch 2: only p4 is novel; p2 keeps its original owner")

    // no new files: AvailableNow run is a no-op, index unchanged
    StreamingIngest.runAvailableNow(spark, docs, index, ckpt, paras, 1000L)
    val after3 = PartitionedUpsert.read(spark, index).count()
    assert(after3 == 4L)
  }

  private def prose(seed: String): String =
    (1 to 40).map(i => s"$seed word$i token${i * 7}").mkString(" ")

  test("near-dup ingest: signature index grows per batch, near-dups drop across batches") {
    val root = Files.createTempDirectory("graft-ingest-nd").toString
    val docs = s"$root/docs"; val index = s"$root/index"; val ckpt = s"$root/ckpt"

    // batch 1: two distinct docs + one within-batch near-dup
    writeBatch(docs, Seq(
      (1L, prose("alpha")), (2L, prose("beta")),
      (3L, prose("alpha") + " tail")))
    StreamingIngest.runAvailableNowNearDup(spark, docs, index, ckpt,
      threshold = 0.5)
    val ids1 = PartitionedUpsert.read(spark, s"$index/sigs")
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == Seq(1L, 2L), "batch 1: 3 drops as within-batch near-dup of 1")

    // batch 2: a near-dup of indexed content + a novel doc
    writeBatch(docs, Seq(
      (4L, prose("beta") + " extra"), (5L, prose("gamma"))))
    StreamingIngest.runAvailableNowNearDup(spark, docs, index, ckpt,
      threshold = 0.5)
    val ids2 = PartitionedUpsert.read(spark, s"$index/sigs")
      .select($"id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids2 == Seq(1L, 2L, 5L), "batch 2: only the novel doc appends")
    // bands table tracks sigs exactly (16 band rows per indexed doc)
    assert(PartitionedUpsert.read(spark, s"$index/bands").count() == 3 * 16L)

    // fresh-checkpoint replay of everything: every doc now matches the
    // index (its own signature included) — nothing appends, nothing dups
    StreamingIngest.runAvailableNowNearDup(spark, docs, index,
      s"$root/ckpt2", threshold = 0.5)
    assert(PartitionedUpsert.read(spark, s"$index/sigs").count() == 3L,
      "replayed batches must append nothing")
  }

  test("compactIndex bounds ingest fragmentation without changing behavior") {
    val root = Files.createTempDirectory("graft-ingest-compact").toString
    val docs = s"$root/docs"; val index = s"$root/index"; val ckpt = s"$root/ckpt"

    // several passes, each upserting into the same hot buckets — every
    // pass rewrites touched buckets shuffle-wide, so files accumulate
    writeBatch(docs, Seq((1L, "p1|p2"), (2L, "p3|p4")))
    StreamingIngest.runAvailableNow(spark, docs, index, ckpt, paras, 1000L)
    (0 until 3).foreach { k =>
      writeBatch(docs, Seq((10L + k, s"p1|q$k|r$k|s$k")))
      StreamingIngest.runAvailableNow(spark, docs, index, ckpt, paras, 1000L)
    }
    val before = PartitionedUpsert.read(spark, index)
      .select($"p_text", $"owner_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val rpt = StreamingIngest.compactIndex(spark, index,
      maxFilesPerPartition = 1, targetFileBytes = Long.MaxValue)
    assert(rpt.partitionsCompacted > 0, "fixture should have fragmented buckets")
    assert(rpt.filesAfter < rpt.filesBefore)

    // content identical, and the ingest invariants still hold: a replay
    // pass over the same docs appends nothing to the compacted index
    val after = PartitionedUpsert.read(spark, index)
      .select($"p_text", $"owner_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before)
    StreamingIngest.runAvailableNow(spark, docs, index, s"$root/ckpt2",
      paras, 1000L)
    assert(PartitionedUpsert.read(spark, index).count() == before.size.toLong)
  }
}
