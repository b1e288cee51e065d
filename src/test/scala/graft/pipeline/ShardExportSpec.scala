package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Epoch shard export: written order matches the epochShuffle permutation,
  * epochs are independent, the manifest verifies from disk, and tampering
  * with the written data is caught.
  */
class ShardExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus() =
    (0 until 200).map(i => (i.toLong, 10L + i % 7)).toDF("id", "toks")

  test("shards carry the epochShuffle order; read-back matches") {
    val root = java.nio.file.Files.createTempDirectory("graft-shard").toString
    val manifest = ShardExport.exportEpoch(corpus(), "id", "toks",
      epoch = 0, nShards = 4, outDir = root)
    val m = manifest.collect()
    assert(m.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(m.map(_.getLong(1)).sum == 200)
    // read-back of shard 2 is in ascending pos order and matches the
    // shuffle's own assignment
    val expected = graft.operators.Sampling
      .epochShuffle(corpus(), "id", epochs = 1, nShards = 4)
      .filter($"shard" === 2).orderBy($"pos")
      .select($"id").as[Long].collect().toSeq
    val got = ShardExport.readShard(spark, root, 0, 2)
      .select($"id").as[Long].collect().toSeq
    assert(got == expected && got.nonEmpty)
    assert(ShardExport.verifyEpoch(spark, root, 0, "id", "toks"))
  }

  test("epochs are independent permutations; re-export is deterministic") {
    val root = java.nio.file.Files.createTempDirectory("graft-shard2").toString
    ShardExport.exportEpoch(corpus(), "id", "toks", 0, 4, root)
    ShardExport.exportEpoch(corpus(), "id", "toks", 1, 4, root)
    val o0 = ShardExport.readShard(spark, root, 0, 1).select($"id").as[Long].collect().toSeq
    val o1 = ShardExport.readShard(spark, root, 1, 1).select($"id").as[Long].collect().toSeq
    assert(o0 != o1, "different epochs must order differently")
    // re-export epoch 0: same manifest, same order
    val m1 = ShardExport.exportEpoch(corpus(), "id", "toks", 0, 4, root)
      .collect().map(_.toSeq).toSeq
    val o0b = ShardExport.readShard(spark, root, 0, 1).select($"id").as[Long].collect().toSeq
    assert(o0b == o0)
    assert(ShardExport.verifyEpoch(spark, root, 0, "id", "toks"))
    assert(m1.nonEmpty)
  }

  test("verifyEpoch catches tampered shard data") {
    val root = java.nio.file.Files.createTempDirectory("graft-shard3").toString
    ShardExport.exportEpoch(corpus(), "id", "toks", 0, 4, root)
    assert(ShardExport.verifyEpoch(spark, root, 0, "id", "toks"))
    // tamper: drop one shard's files entirely
    val shardDir = new java.io.File(s"$root/epoch=0/shard=3")
    shardDir.listFiles().foreach(_.delete())
    shardDir.delete()
    assert(!ShardExport.verifyEpoch(spark, root, 0, "id", "toks"))
    // missing manifest is a verification failure, not an exception
    assert(!ShardExport.verifyEpoch(spark, root, 5, "id", "toks"))
  }
}
