package graft.pipeline

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The partition-pruned upsert must (a) produce exactly the state a full
  * recompute produces, (b) physically rewrite ONLY the buckets containing
  * updated keys — asserted on the actual parquet files on disk — and
  * (c) prune the read to the affected buckets at scan planning time.
  */
class PartitionedUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val NB = 16

  private def freshDir(): Path = Files.createTempDirectory("graft-upsert")

  private def dataFiles(dir: Path): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(dir)
    try walk.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map(p => dir.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
    finally walk.close()
  }

  test("upsert state equals a full recompute; untouched bucket files are untouched") {
    val dir = freshDir()
    val base = Tables.load(spark, TestSpark.sf, "documents")
      .select($"doc_id", $"lang", $"n_chars")
    PartitionedUpsert.writeInitial(base, dir.toString, "doc_id", NB)
    val before = dataFiles(dir)

    // update a small slice: one known doc gets three replacement rows
    val updates = Seq((7L, "xx", 111L), (7L, "xx", 222L), (13L, "yy", 333L))
      .toDF("doc_id", "lang", "n_chars")
    PartitionedUpsert.upsertByKey(spark, dir.toString, updates, "doc_id", NB)

    val got = PartitionedUpsert.read(spark, dir.toString)
      .select($"doc_id", $"lang", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    val expected = (base.filter(!$"doc_id".isin(7L, 13L)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))) ++
      Seq((7L, "xx", 111L), (7L, "xx", 222L), (13L, "yy", 333L))).toSeq.sorted
    assert(got == expected)

    // only the buckets of keys 7 and 13 may have changed on disk
    val after = dataFiles(dir)
    val touched = Set(7L, 13L).map(k =>
      base.sparkSession.range(1).select(
        PartitionedUpsert.bucketOf(lit(k), NB)).head().getInt(0))
    val (changedOk, untouched) = before.partition { case (rel, _) =>
      touched.exists(b => rel.contains(s"_bucket=$b"))
    }
    untouched.foreach { case (rel, mtime) =>
      assert(after.contains(rel), s"untouched bucket file disappeared: $rel")
      assert(after(rel) == mtime, s"untouched bucket file rewritten: $rel")
    }
    assert(changedOk.nonEmpty, "fixture must touch at least one bucket")
  }

  test("the upsert read prunes to the affected buckets (PartitionFilters)") {
    val dir = freshDir()
    val base = Tables.load(spark, TestSpark.sf, "documents")
      .select($"doc_id", $"lang", $"n_chars")
    PartitionedUpsert.writeInitial(base, dir.toString, "doc_id", NB)
    val b = spark.range(1).select(PartitionedUpsert.bucketOf(lit(7L), NB)).head().getInt(0)
    val pruned = spark.read.parquet(dir.toString).filter(col("_bucket").isin(b))
    val p = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = p.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("_bucket"), "bucket predicate missing from PartitionFilters:\n" + p.take(1500))
  }

  test("empty update set is a no-op") {
    val dir = freshDir()
    val base = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "v")
    PartitionedUpsert.writeInitial(base, dir.toString, "doc_id", NB)
    val before = dataFiles(dir)
    PartitionedUpsert.upsertByKey(spark, dir.toString,
      Seq.empty[(Long, String)].toDF("doc_id", "v"), "doc_id", NB)
    assert(dataFiles(dir) == before)
  }

  test("replace-parent semantics: old rows of an updated key all disappear") {
    val dir = freshDir()
    val base = Seq((1L, "old1"), (1L, "old2"), (2L, "keep")).toDF("doc_id", "v")
    PartitionedUpsert.writeInitial(base, dir.toString, "doc_id", NB)
    PartitionedUpsert.upsertByKey(spark, dir.toString,
      Seq((1L, "new")).toDF("doc_id", "v"), "doc_id", NB)
    val got = PartitionedUpsert.read(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "new"), (2L, "keep")))
  }

  test("knownKeys (shared distinctKeyRows) upserts identically") {
    val mk = Seq((1L, "old"), (2L, "keep"), (3L, "bye")).toDF("doc_id", "v")
    val upd = Seq((1L, "new"), (3L, "newer"), (9L, "fresh")).toDF("doc_id", "v")
    val dirA = freshDir(); val dirB = freshDir()
    PartitionedUpsert.writeInitial(mk, dirA.toString, "doc_id", NB)
    PartitionedUpsert.writeInitial(mk, dirB.toString, "doc_id", NB)
    PartitionedUpsert.upsertByKey(spark, dirA.toString, upd, "doc_id", NB)
    val keys = PartitionedUpsert.distinctKeyRows(upd, "doc_id", NB)
    PartitionedUpsert.upsertByKey(spark, dirB.toString, upd, "doc_id", NB,
      Some(keys))
    def state(d: Path) = PartitionedUpsert.read(spark, d.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state(dirA) == state(dirB))
    assert(state(dirA) ==
      Set((1L, "new"), (2L, "keep"), (3L, "newer"), (9L, "fresh")))
  }

  test("distributed fallback shape produces the same state as the collected one") {
    val mk = (1L to 40L).map(i => (i, s"old$i")).toDF("doc_id", "v")
    val upd = Seq((7L, "new7"), (21L, "new21"), (99L, "fresh")).toDF("doc_id", "v")
    val dirA = freshDir(); val dirB = freshDir()
    PartitionedUpsert.writeInitial(mk, dirA.toString, "doc_id", NB)
    PartitionedUpsert.writeInitial(mk, dirB.toString, "doc_id", NB)
    PartitionedUpsert.upsertByKey(spark, dirA.toString, upd, "doc_id", NB)
    PartitionedUpsert.upsertByKeyDistributed(spark, dirB.toString,
      upd.withColumn("_bucket",
        PartitionedUpsert.bucketOf(col("doc_id"), NB)), "doc_id")
    def state(d: Path) = PartitionedUpsert.read(spark, d.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state(dirA) == state(dirB))
  }
}
