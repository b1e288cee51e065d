package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Atomic versioned publication: pointer flips, pinned readers, retention. */
class VersionedIndexSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("publish flips CURRENT atomically; readers see full versions only") {
    val root = Files.createTempDirectory("graft-vidx").toString
    val v0 = VersionedIndex.publish(Seq((1L, "a")).toDF("id", "v"), root)
    assert(v0 == "v000")
    assert(VersionedIndex.currentVersion(root).contains("v000"))
    assert(VersionedIndex.readCurrent(spark, root).count() == 1L)

    val v1 = VersionedIndex.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    assert(v1 == "v001")
    assert(VersionedIndex.readCurrent(spark, root).count() == 2L)
  }

  test("a reader pinned to the old version survives a publish") {
    val root = Files.createTempDirectory("graft-vidx").toString
    VersionedIndex.publish(Seq((1L, "old")).toDF("id", "v"), root)
    val pinned = VersionedIndex.readCurrent(spark, root).localCheckpoint(true)
    VersionedIndex.publish(
      Seq((1L, "new"), (2L, "new")).toDF("id", "v"), root, keepVersions = 2)
    // pinned data still the old snapshot; files still on disk (keep=2)
    assert(pinned.count() == 1L)
    assert(VersionedIndex.readVersion(spark, root, "v000").count() == 1L)
    assert(VersionedIndex.readCurrent(spark, root).count() == 2L)
  }

  test("vacuum keeps the newest versions and never the published one") {
    val root = Files.createTempDirectory("graft-vidx").toString
    (1 to 4).foreach(i => VersionedIndex.publish(
      (1L to i.toLong).toDF("id"), root, keepVersions = 2))
    val vs = VersionedIndex.versions(root)
    assert(vs == Seq("v002", "v003"), s"retention failed: $vs")
    assert(VersionedIndex.currentVersion(root).contains("v003"))
    assert(VersionedIndex.readCurrent(spark, root).count() == 4L)
  }

  test("version order is numeric past v999, not lexicographic") {
    val root = Files.createTempDirectory("graft-vidx").toString
    Seq("v998", "v999", "v1000").foreach(v =>
      Files.createDirectories(java.nio.file.Paths.get(root, v)))
    assert(VersionedIndex.versions(root) == Seq("v998", "v999", "v1000"))
  }

  test("publishing is crash-safe: no CURRENT update without full data") {
    val root = Files.createTempDirectory("graft-vidx").toString
    VersionedIndex.publish(Seq((1L, "a")).toDF("id", "v"), root)
    // a stale tmp pointer from a crashed writer must not confuse readers
    Files.writeString(java.nio.file.Paths.get(root, ".CURRENT.v9.tmp"), "v9")
    assert(VersionedIndex.currentVersion(root).contains("v000"))
    assert(VersionedIndex.readCurrent(spark, root).count() == 1L)
  }
}
