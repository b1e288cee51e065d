package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Small-file compaction: only oversized partitions are rewritten (healthy
  * partitions' files byte-untouched), bin-packing honors the target size,
  * content is preserved exactly, and a second run is a no-op.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"

  /** A 4-bucket table where buckets 0..2 are written healthy (one file)
    * and bucket 3 is fragmented into many small files via repeated
    * appends.
    */
  private def fragmentedTable(dir: String): Long = {
    import spark.implicits._
    val base = (0 until 400).map(i => (i.toLong, s"payload-$i" * 10))
      .toDF("id", "text")
      .withColumn("_bucket", pmod(col("id"), lit(4)).cast("int"))
    base.filter($"_bucket" < 3).coalesce(1)
      .write.partitionBy("_bucket").parquet(dir)
    // fragment bucket 3: ten single-file appends (ids ≡ 3 mod 4 split by
    // their residue mod 40 — ten classes of ten ids each)
    (0 until 10).foreach { k =>
      base.filter($"_bucket" === 3 && pmod($"id", lit(40)) === 3 + 4 * k)
        .coalesce(1).write.mode("append").partitionBy("_bucket").parquet(dir)
    }
    spark.read.parquet(dir).count()
  }

  private def partitionFiles(dir: String, part: String): Seq[java.io.File] = {
    val d = new java.io.File(dir, part)
    if (!d.exists) Seq.empty
    else d.listFiles.toSeq.filter(f => f.isFile && !f.getName.startsWith("_") &&
      !f.getName.startsWith("."))
  }

  test("compacts only oversized partitions and preserves content exactly") {
    import spark.implicits._
    val dir = freshDir()
    fragmentedTable(dir)
    val beforeRows = spark.read.parquet(dir)
      .select($"id", $"text").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val healthyBefore = partitionFiles(dir, "_bucket=1")
      .map(f => (f.getName, f.lastModified, f.length))
    val fragBefore = partitionFiles(dir, "_bucket=3").size
    assert(fragBefore >= 5, s"fixture should fragment bucket 3, got $fragBefore files")

    val rpt = Compaction.compactPartitioned(spark, dir, "_bucket",
      maxFilesPerPartition = 4, targetFileBytes = Long.MaxValue)
    assert(rpt.partitionsScanned == 4 && rpt.partitionsCompacted == 1)
    assert(rpt.filesBefore == 3 + fragBefore)
    assert(rpt.filesAfter == 4) // three healthy + bucket 3 packed to one
    assert(partitionFiles(dir, "_bucket=3").size == 1)

    // healthy partitions byte-untouched (same files, same mtimes)
    val healthyAfter = partitionFiles(dir, "_bucket=1")
      .map(f => (f.getName, f.lastModified, f.length))
    assert(healthyAfter == healthyBefore)

    // content identical
    val afterRows = spark.read.parquet(dir)
      .select($"id", $"text").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(afterRows.sameElements(beforeRows))

    // idempotent: second run rewrites nothing
    val rpt2 = Compaction.compactPartitioned(spark, dir, "_bucket",
      maxFilesPerPartition = 4, targetFileBytes = Long.MaxValue)
    assert(rpt2.partitionsCompacted == 0 && rpt2.filesAfter == rpt2.filesBefore)
  }

  test("bin-packing splits a partition into ~bytes/target files") {
    import spark.implicits._
    val dir = freshDir()
    fragmentedTable(dir)
    val bytes3 = partitionFiles(dir, "_bucket=3").map(_.length).sum
    // target a third of the partition → expect 2..4 files (hash slots may
    // under-fill but never exceed the ceiling)
    val target = math.max(1L, bytes3 / 3)
    val expectMax = ((bytes3 + target - 1) / target).toInt
    Compaction.compactPartitioned(spark, dir, "_bucket",
      maxFilesPerPartition = 4, targetFileBytes = target)
    val n = partitionFiles(dir, "_bucket=3").size
    assert(n >= 2 && n <= expectMax, s"got $n files, ceiling $expectMax")
  }

  test("empty and missing tables report zeros") {
    val rpt = Compaction.compactPartitioned(spark, freshDir() + "/nope",
      "_bucket", 4, 1L << 20)
    assert(rpt == Compaction.Report(0, 0, 0, 0, 0))
  }

  test("compactFlat bounds a drift-log dir, preserves rows exactly, no-ops below threshold") {
    import spark.implicits._
    val dir = freshDir()
    // the drift-log shape: N single-row appends (two sharing a batch_id —
    // a crash replay — so the dropDuplicates read is part of the check)
    val ids = Seq(0L, 1L, 2L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)
    ids.zipWithIndex.foreach { case (b, i) =>
      Seq((b, 100L + i, 0.5 + i * 0.01, i % 3 == 0))
        .toDF("batch_id", "n", "mean_rn", "drifted")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    def files() = new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).size
    assert(files() == ids.length, "fixture: one file per append")
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val dedupBefore = spark.read.parquet(dir).dropDuplicates("batch_id").count()

    val rpt = Compaction.compactFlat(spark, dir, maxFiles = 4)
    assert(rpt.filesBefore == ids.length && rpt.filesAfter == 1, rpt.toString)
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(after == before, "rows must only move between files")
    assert(spark.read.parquet(dir).dropDuplicates("batch_id").count() == dedupBefore)
    // idempotent: the compacted dir is below threshold → untouched
    val again = Compaction.compactFlat(spark, dir, maxFiles = 4)
    assert(again.partitionsCompacted == 0 && again.filesAfter == 1, again.toString)
    // missing dir reports zeros
    assert(Compaction.compactFlat(spark, dir + "/nope", 4) ==
      Compaction.Report(0, 0, 0, 0, 0))
  }

  test("compactFlat merges mixed footer schemas instead of dropping columns") {
    import spark.implicits._
    val dir = freshDir()
    // an append log across code versions: old files lack p95_rn, new
    // ones carry it — a single-footer read would lose one column forever
    (0 until 3).foreach { k =>
      Seq((s"old$k", 1L)).toDF("batch_id", "n")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    (0 until 3).foreach { k =>
      Seq((s"new$k", 2L, 0.5)).toDF("batch_id", "n", "p95_rn")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val rpt = Compaction.compactFlat(spark, dir, maxFiles = 4)
    assert(rpt.partitionsCompacted == 1 && rpt.rowsRewritten == 6, rpt.toString)
    val back = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(back.columns.toSet == Set("batch_id", "n", "p95_rn"))
    assert(back.filter($"p95_rn".isNotNull).count() == 3)
    assert(back.select($"batch_id").distinct().count() == 6)
  }

  test("escaped partition values (spaces, colons) and nulls still compact") {
    import spark.implicits._
    val dir = freshDir()
    // string partition values that Hive path-escapes in directory names,
    // plus a null partition (__HIVE_DEFAULT_PARTITION__)
    val vals = Seq("plain", "has space", "a:colon", null)
    val rows = (0 until 200).map(i => (i.toLong, vals(i % 4)))
    val df = rows.toDF("id", "cat")
    // fragment every partition: five single-file appends each
    (0 until 5).foreach { k =>
      df.filter(pmod($"id", lit(5)) === k)
        .coalesce(1).write.mode("append").partitionBy("cat").parquet(dir)
    }
    val beforeRows = spark.read.parquet(dir)
      .select($"id", $"cat").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    val dirs = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.contains("%")), s"fixture should escape a name: ${dirs.toSeq}")
    assert(dirs.exists(_.contains("__HIVE_DEFAULT_PARTITION__")), dirs.toSeq.toString)

    val rpt = Compaction.compactPartitioned(spark, dir, "cat",
      maxFilesPerPartition = 2, targetFileBytes = Long.MaxValue)
    // every partition was fragmented to 5 files; ALL four must compact —
    // including the escaped and null ones the raw-name match used to skip
    assert(rpt.partitionsCompacted == 4, rpt.toString)
    assert(rpt.filesAfter == 4, rpt.toString)
    val afterRows = spark.read.parquet(dir)
      .select($"id", $"cat").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    assert(afterRows.sameElements(beforeRows))
  }
}
