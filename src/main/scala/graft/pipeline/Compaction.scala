package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for hash-partitioned parquet tables (the storage
  * side of K3/K7: every incremental upsert and streaming micro-batch
  * appends task-sized files, and at 100 TB a table maintained by
  * [[PartitionedUpsert]] or [[StreamingIngest]] accumulates thousands of
  * small files per partition — scan task-launch overhead and NameNode/
  * listing pressure grow with file COUNT, not bytes). Compaction is the
  * maintenance pass every production lakehouse runs (Delta OPTIMIZE /
  * Iceberg rewrite_data_files); here it is a surgical rewrite:
  *
  *  - the filesystem listing decides which partitions exceed
  *    `maxFilesPerPartition` — data is never read to decide;
  *  - ONE job reads just those partitions (PartitionFilters-pruned),
  *    assigns each row a target-file slot (`hash(row) mod n_p` where
  *    `n_p = ceil(partitionBytes / targetFileBytes)`), and rewrites them
  *    via dynamic partition overwrite — a task holding rows of k
  *    partitions writes k files, so each compacted partition ends with
  *    ≤ n_p files and every healthy partition's files are untouched;
  *  - content is preserved exactly (rows only move between files).
  *
  * The per-partition file-count map is bounded driver state (one entry
  * per partition directory — the same order as the planner's own
  * partition listing), not corpus-sized data.
  */
object Compaction {

  final case class Report(partitionsScanned: Long, partitionsCompacted: Long,
      filesBefore: Long, filesAfter: Long, rowsRewritten: Long)

  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** (partition dir name → (file count, total bytes)) for `col=value`
    * children of `dir`.
    */
  private def listPartitions(spark: SparkSession, dir: String,
      partCol: String): Map[String, (Long, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    fs.listStatus(p).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .map { d =>
        val files = fs.listStatus(d.getPath).filter(f => f.isFile && isDataFile(f.getPath.getName))
        d.getPath.getName -> (files.length.toLong, files.map(_.getLen).sum)
      }
      .toMap
  }

  /** Compact every partition of `dir` whose data-file count exceeds
    * `maxFilesPerPartition`, bin-packing to `targetFileBytes`. Returns
    * the before/after accounting. Idempotent: a second run finds nothing
    * above the threshold and rewrites nothing.
    */
  def compactPartitioned(spark: SparkSession, dir: String, partCol: String,
      maxFilesPerPartition: Int, targetFileBytes: Long): Report = {
    require(maxFilesPerPartition >= 1, "maxFilesPerPartition must be >= 1")
    require(targetFileBytes >= 1, "targetFileBytes must be >= 1")
    val before = listPartitions(spark, dir, partCol)
    val oversized = before.filter(_._2._1 > maxFilesPerPartition)
    val filesBefore = before.valuesIterator.map(_._1).sum
    if (oversized.isEmpty)
      return Report(before.size, 0, filesBefore, filesBefore, 0L)

    // partition VALUE (the part after "col=") → target file count. The
    // directory name is Hive path-ESCAPED (spaces, colons → %XX; null →
    // __HIVE_DEFAULT_PARTITION__) while col(partCol) carries the unescaped
    // value, so the raw name must be unescaped before it can ever match —
    // comparing raw names silently skips every escaped partition.
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val defaultPart = ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    val targets: Map[String, Int] = oversized.map { case (name, (_, bytes)) =>
      ExternalCatalogUtils.unescapePathName(name.substring(partCol.length + 1)) ->
        math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    }
    val hasNullPart = targets.contains(defaultPart)
    val bTargets = spark.sparkContext.broadcast(targets)
    val slotOf = udf((pv: String, h: Int) => {
      val n = bTargets.value.getOrElse(if (pv == null) defaultPart else pv, 1)
      ((h % n) + n) % n
    })
    val nonNullKeys = targets.keys.filterNot(_ == defaultPart).toSeq
    // isin never matches NULL — the null partition needs its own disjunct
    val partPred =
      if (hasNullPart) col(partCol).cast("string").isin(nonNullKeys: _*) || col(partCol).isNull
      else col(partCol).cast("string").isin(nonNullKeys: _*)
    val affected = spark.read.parquet(dir).filter(partPred)
    val dataCols = affected.columns.filterNot(_ == partCol).map(col)
    val totalSlots = math.max(1, targets.valuesIterator.sum)
    val packed = affected
      .withColumn("_slot", slotOf(col(partCol).cast("string"), hash(dataCols: _*)))
      .repartition(totalSlots, col(partCol), col("_slot"))
      .drop("_slot")
      // materialize before overwriting the very files being read — the
      // PartitionedUpsert discipline
      .localCheckpoint(true)
    val rows = packed.count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try packed.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(dir)
    finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      bTargets.destroy()
    }
    // Count the partitions the job actually rewrote (distinct partition
    // values present in the rewritten data — groupBy counts the null
    // group too), not the partitions the listing MEANT to rewrite: a
    // target that matched no rows was not compacted and must not be
    // reported as such. packed is checkpointed, so this is a cheap pass.
    val rewritten = packed.groupBy(col(partCol)).count().count()
    val after = listPartitions(spark, dir, partCol)
    Report(before.size, rewritten, filesBefore,
      after.valuesIterator.map(_._1).sum, rows)
  }

  /** Compaction for FLAT (unpartitioned) append-log directories — the
    * drift logs: every monitored append / streaming micro-batch lands
    * one single-row file, so a year of hourly batches means 8 760 footer
    * reads per monitor scan. When the dir holds more than `maxFiles`
    * data files, rewrite it as `ceil(bytes / targetFileBytes)` files
    * (for a drift log: one). Content is preserved exactly — rows only
    * move between files, so `dropDuplicates("batch_id")` reads the same
    * before and after. Idempotent; no-op below the threshold. The
    * checkpoint-then-overwrite is the [[PartitionedUpsert]] discipline
    * (never overwrite the files being read).
    */
  def compactFlat(spark: SparkSession, dir: String,
      maxFiles: Int = 8, targetFileBytes: Long = 128L << 20): Report = {
    require(maxFiles >= 1, "maxFiles must be >= 1")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Report(0, 0, 0, 0, 0)
    val files = fs.listStatus(p).filter(f => f.isFile && isDataFile(f.getPath.getName))
    val nBefore = files.length.toLong
    if (nBefore <= maxFiles) return Report(1, 0, nBefore, nBefore, 0)
    val nTarget = math.max(1L,
      (files.map(_.getLen).sum + targetFileBytes - 1) / targetFileBytes).toInt
    // mergeSchema: an append log accumulated across code versions mixes
    // footer schemas (e.g. old drift_log files without p95_rn beside new
    // ones with it); the default single-footer read would silently drop
    // the columns the sampled footer lacks and the Overwrite would make
    // that loss permanent
    val packed = spark.read.option("mergeSchema", "true").parquet(dir)
      .coalesce(nTarget).localCheckpoint(true)
    val rows = packed.count()
    packed.write.mode(SaveMode.Overwrite).parquet(dir)
    val after = fs.listStatus(p)
      .count(f => f.isFile && isDataFile(f.getPath.getName)).toLong
    Report(1, 1, nBefore, after, rows)
  }
}
