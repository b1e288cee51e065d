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

  test("tar export: GNU-readable shards, manifest-exact, tamper-detected") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-tar").toString
    val docs = (0L until 120L).map(i => (i, s"document body $i " * (1 + (i % 5).toInt)))
      .toDF("id", "text")
    val manifest = ShardExport.exportTarShards(docs, "id", "text",
      epoch = 2, nShards = 4, outDir = root).localCheckpoint(true)
    val rows = manifest.collect()
    assert(rows.map(_.getLong(1)).sum == 120)
    assert(ShardExport.verifyTarEpoch(spark, root, 2, manifest))
    // every archive parses with our total reader, members in pos order,
    // and the byte count matches the pure arithmetic
    rows.foreach { m =>
      val f = java.nio.file.Paths.get(f"$root/epoch=2/shard-${m.getInt(0)}%05d.tar")
      val bytes = java.nio.file.Files.readAllBytes(f)
      assert(bytes.length.toLong == m.getLong(2))
      val members = graft.formats.Tar.list(bytes).get
      assert(members.length.toLong == m.getLong(1))
      assert(members.map(_._1) == members.map(_._1).sorted)
      assert(bytes.length ==
        graft.formats.Tar.archiveBytes(members.map(_._2.length.toLong)))
    }
    // re-export is byte-identical (deterministic tars → same md5s)
    val again = ShardExport.exportTarShards(docs, "id", "text",
      epoch = 2, nShards = 4, outDir = root).collect()
    assert(again.map(_.getString(3)).toSeq == rows.map(_.getString(3)).toSeq)
    // tamper: flip one byte inside a shard → verify fails
    val victim = java.nio.file.Paths.get(f"$root/epoch=2/shard-00001.tar")
    val b = java.nio.file.Files.readAllBytes(victim)
    b(600) = (b(600) ^ 0x7f).toByte
    java.nio.file.Files.write(victim, b)
    assert(!ShardExport.verifyTarEpoch(spark, root, 2, manifest))
  }
}
