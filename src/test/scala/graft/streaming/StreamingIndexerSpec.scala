package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

import java.nio.file.Files

/** Trigger.AvailableNow + foreachBatch ingestion: the streaming form of the
  * incremental indexer. New files become chunks exactly once; a second pass
  * with no new data is a no-op (checkpoint) and a replay with a fresh
  * checkpoint is idempotent (deterministic chunk keys).
  */
class StreamingIndexerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("availableNow pass ingests new files once and is checkpoint-idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-streamidx").toString
    val docsDir = s"$root/docs"
    val indexDir = s"$root/index"
    val ckpt = s"$root/ckpt"

    val batch1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta " * 10, "en", "s1"),
      (2L, "one two three four five six seven " * 10, "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    batch1.write.mode("append").parquet(docsDir)

    StreamingIndexer.runAvailableNow(spark, docsDir, indexDir, ckpt)
    val index1 = spark.read.parquet(indexDir)
    val n1 = index1.count()
    assert(n1 > 0)
    assert(index1.select("parent_id").distinct().count() == 2)

    // no new files → the checkpoint means nothing re-ingests
    StreamingIndexer.runAvailableNow(spark, docsDir, indexDir, ckpt)
    assert(spark.read.parquet(indexDir).count() == n1)

    // a third document arrives → only its chunks are added
    Seq((3L, "lorem ipsum dolor sit amet consectetur " * 10, "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("append").parquet(docsDir)
    StreamingIndexer.runAvailableNow(spark, docsDir, indexDir, ckpt)
    val index2 = spark.read.parquet(indexDir)
    assert(index2.select("parent_id").distinct().count() == 3)
    assert(index2.filter($"parent_id".isin(1L, 2L)).count() == n1)

    // full replay with a fresh checkpoint converges to the same index
    // (deterministic chunk keys → replace-parent is idempotent)
    val ids = index2.select("id").collect().map(_.getString(0)).toSet
    StreamingIndexer.runAvailableNow(spark, docsDir, indexDir, s"$root/ckpt2")
    val replayed = spark.read.parquet(indexDir).select("id")
      .collect().map(_.getString(0)).toSet
    assert(replayed == ids)
  }
}
