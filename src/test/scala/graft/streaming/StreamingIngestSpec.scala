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
}
