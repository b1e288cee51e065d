package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import scala.jdk.CollectionConverters._

/** Atomic index publication: writers materialize a full new version in its
  * own directory, then flip a single pointer file — readers pin a version
  * at open time and never observe a half-written index, and concurrent
  * readers of the previous version keep working while (and after) the new
  * one publishes. This is the snapshot-isolation discipline a 100 TB
  * serving index needs around [[ChunkIndexer.replaceParents]]-style
  * rebuilds: an overwrite-in-place of a live directory would race every
  * reader; a pointer flip is one atomic rename.
  *
  * Layout: `<root>/v<NNN>/...parquet` + `<root>/CURRENT` (contains "v<NNN>").
  * Retention keeps the latest `keepVersions` directories so pinned readers
  * drain before their version is vacuumed.
  */
object VersionedIndex {

  private def currentFile(root: String): Path = Paths.get(root, "CURRENT")

  /** The currently-published version name, if any. */
  def currentVersion(root: String): Option[String] = {
    val f = currentFile(root)
    if (Files.exists(f)) Some(Files.readString(f).trim) else None
  }

  /** Write `df` as the next version and atomically publish it.
    * Returns the new version name.
    */
  def publish(df: DataFrame, root: String, keepVersions: Int = 2): String =
    publishInto(root, keepVersions)(dir =>
      df.write.mode(SaveMode.Overwrite).parquet(dir))

  /** [[publish]] with a caller-materialized version directory — for
    * layouts that aren't one plain parquet table (the partition-per-cell
    * graph index, multi-table indexes). `write` receives the fresh
    * version directory; the pointer flips only AFTER it returns, so a
    * writer crash mid-materialization leaves CURRENT untouched and
    * readers never observe the partial version.
    */
  def publishInto(root: String, keepVersions: Int = 2)(
      write: String => Unit): String = {
    Files.createDirectories(Paths.get(root))
    val next = currentVersion(root) match {
      case Some(v) => f"v${v.stripPrefix("v").toInt + 1}%03d"
      case None => "v000"
    }
    write(s"$root/$next")
    // the data is fully on disk before the pointer moves: write-then-rename
    // makes the flip atomic on POSIX filesystems
    val tmp = Paths.get(root, s".CURRENT.$next.tmp")
    Files.writeString(tmp, next)
    Files.move(tmp, currentFile(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    vacuum(root, keepVersions)
    next
  }

  /** Open the CURRENT version (pinned: later publishes don't affect the
    * returned DataFrame's underlying files until vacuum).
    */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no published version under $root"))
    spark.read.parquet(s"$root/$v")
  }

  /** Open a specific pinned version. */
  def readVersion(spark: SparkSession, root: String, version: String): DataFrame =
    spark.read.parquet(s"$root/$version")

  /** All version directories, oldest first. */
  def versions(root: String): Seq[String] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) return Seq.empty
    Files.list(p).iterator().asScala
      .filter(d => Files.isDirectory(d) && d.getFileName.toString.matches("v\\d+"))
      .map(_.getFileName.toString).toSeq
      // numeric order, not lexicographic: "v1000" must sort after "v999"
      .sortBy(_.stripPrefix("v").toLong)
  }

  /** Drop all but the newest `keep` versions (never the published one). */
  def vacuum(root: String, keep: Int): Unit = {
    val cur = currentVersion(root)
    val vs = versions(root)
    vs.dropRight(keep).filterNot(cur.contains).foreach { v =>
      val dir = Paths.get(root, v)
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
  }
}
