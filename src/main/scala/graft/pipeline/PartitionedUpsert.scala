package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert into a parquet table WITHOUT rewriting the table: rows live
  * in `nBuckets` hash partitions of the key, and an upsert rewrites ONLY
  * the partitions that contain updated keys. This is the scale form of the
  * reference's replace-parent sink (K2/K3, blob_storage_indexer.py:
  * replace-merge): at 100 TB a full-index rewrite per incremental run is
  * the cost the incremental design exists to avoid — with 10k buckets, a
  * run touching 10 parents rewrites ≤ 10/10k of the files, and the bucket
  * filter prunes the read to those partitions at scan planning time.
  *
  * Mechanics: dynamic partition overwrite (only partitions present in the
  * written data are replaced) + a partition-pruned read of the affected
  * buckets + an anti-join inside them. Untouched bucket directories are
  * never read, never written.
  */
object PartitionedUpsert {

  def bucketOf(key: Column, nBuckets: Int): Column =
    pmod(hash(key), lit(nBuckets))

  /** The table's bucket count, persisted beside the data (an `_`-prefixed
    * file, invisible to the parquet reader like _SUCCESS). An upsert with
    * a DIFFERENT count would hash updated keys into the wrong partitions:
    * the pruned read then misses the old rows, the anti-join never removes
    * them, and replaced keys silently duplicate — the marker turns that
    * silent corruption into an immediate error.
    */
  private def markerPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_nbuckets")

  private def writeMarker(spark: SparkSession, dir: String, nBuckets: Int): Unit = {
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(nBuckets.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The stored bucket count, if the marker exists (tables written before
    * the marker shipped have none — those skip validation).
    */
  def storedBuckets(spark: SparkSession, dir: String): Option[Int] = {
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](64)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        val raw = new String(buf.toByteArray, "UTF-8").trim
        // fail with the marker path in hand: a truncated/corrupted marker
        // would otherwise surface as a bare NumberFormatException and
        // permanently block upserts with no hint at the remedy
        try Some(raw.toInt)
        catch {
          case _: NumberFormatException =>
            throw new IllegalStateException(
              s"unreadable _nbuckets marker at $p (content: '$raw'); " +
                "delete the marker (validation is skipped when absent) or " +
                "rewrite it with the table's bucket count")
        }
      } finally in.close()
    }
  }

  /** Initial load: write `df` partitioned by the key's hash bucket. */
  def writeInitial(df: DataFrame, dir: String, keyCol: String, nBuckets: Int): Unit = {
    df.withColumn("_bucket", bucketOf(col(keyCol), nBuckets))
      .write.mode(SaveMode.Overwrite).partitionBy("_bucket").parquet(dir)
    // after the data write: Overwrite clears the directory first
    writeMarker(df.sparkSession, dir, nBuckets)
  }

  /** The distinct (key, bucket) rows of an update slice — ONE job. A
    * caller upserting SEVERAL tables keyed by the same column with the
    * same bucket count (the streaming ingest's sigs/bands twins: band
    * rows carry exactly the signature ids) computes this once and passes
    * it to each [[upsertByKey]], instead of paying the distinct-collect
    * job per table (r20, guide §1.2 — at the local scheduler floor that
    * job is the upsert's overhead, not its work). The array doubling as
    * the emptiness check also replaces the caller's per-batch `isEmpty`
    * job (empty ⇔ no keys).
    */
  def distinctKeyRows(updates: DataFrame, keyCol: String,
      nBuckets: Int): Array[org.apache.spark.sql.Row] =
    updates.select(col(keyCol), bucketOf(col(keyCol), nBuckets).as("_bucket"))
      .distinct().collect()

  /** Replace every row whose key appears in `updates` with the update rows
    * (replace-parent semantics: ALL old rows of an updated key go away,
    * however many new rows it has now). Only the affected buckets are read
    * or written; `updates` should be the incremental-run changed slice,
    * not the corpus — a slice whose key set overflows
    * `spark.driver.maxResultSize` falls back to the distributed
    * distinct/anti-join shape instead of failing (r19 advice: "small by
    * contract" is not enforced, so the contract violation must degrade,
    * not corrupt or crash).
    *
    * `knownKeys`: the precomputed [[distinctKeyRows]] of `updates` —
    * MUST be exactly its distinct (key, bucket) set (a key present here
    * but absent from `updates` would have its old rows deleted with no
    * replacement).
    */
  def upsertByKey(spark: SparkSession, dir: String, updates: DataFrame,
      keyCol: String, nBuckets: Int,
      knownKeys: Option[Array[org.apache.spark.sql.Row]] = None): Unit = {
    storedBuckets(spark, dir).foreach(stored => require(stored == nBuckets,
      s"bucket-count mismatch: the table at $dir was written with $stored " +
        s"buckets but the upsert was called with $nBuckets — updated keys " +
        "would hash into the wrong partitions and replaced rows would " +
        "silently duplicate"))
    val fresh = updates.withColumn("_bucket", bucketOf(col(keyCol), nBuckets))
    // ONE collect drives both the partition-pruned read (bucket list) and
    // the replace anti-join (key set) — the changed slice is small by
    // contract, and the old shape paid two extra scheduler-floor jobs per
    // upsert (a second distinct for the buckets plus the broadcast build
    // of a distributed keys plan; a LocalRelation broadcast builds on the
    // driver with no job). r19, guide §1.2/§2.4.
    val keyRows =
      knownKeys.getOrElse {
        try fresh.select(col(keyCol), col("_bucket")).distinct().collect()
        catch {
          // key set too big to collect (driver.maxResultSize): the slice
          // broke the small-by-contract assumption — fall back to the
          // distributed shape (collect only the ≤nBuckets bucket ids,
          // keep the key anti-join distributed) rather than fail
          case e: org.apache.spark.SparkException
              if e.getMessage != null &&
                e.getMessage.contains("maxResultSize") =>
            upsertByKeyDistributed(spark, dir, fresh, keyCol)
            return
        }
      }
    if (keyRows.isEmpty) return
    val buckets = keyRows.map(_.getInt(1)).distinct.toSeq
    // reader schema = the updates' own shape (the table was written from
    // the same shape by writeInitial/previous upserts): skips the per-call
    // schema-inference job
    val affected = spark.read.schema(fresh.schema).parquet(dir)
      .filter(col("_bucket").isin(buckets: _*)) // PartitionFilters: pruned scan
    val keyField = updates.schema(updates.schema.fieldIndex(keyCol))
    val keys = spark.createDataFrame(
      java.util.Arrays.asList(keyRows.map(r =>
        org.apache.spark.sql.Row(r.get(0))): _*),
      org.apache.spark.sql.types.StructType(Seq(keyField)))
    val kept = affected.join(broadcast(keys), Seq(keyCol), "left_anti")
    // localCheckpoint materializes the merged partitions so the subsequent
    // overwrite of the same path is legal (the files are no longer read)
    // and the delete-then-write window never observes half-deleted input
    val merged = kept.unionByName(fresh).localCheckpoint(true)
    // writer-level option (takes precedence over the session conf): no
    // mutable session state, so concurrent upserts to DIFFERENT tables
    // are safe — StreamingIngest overlaps its sigs/bands maintenance
    merged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_bucket").parquet(dir)
  }

  /** The pre-r19 distributed upsert shape, kept as [[upsertByKey]]'s
    * fallback for an update slice whose key set cannot collect: the
    * bucket list (≤ nBuckets rows) is the only driver state; the key
    * anti-join stays a distributed join of the pruned read against the
    * updates' own distinct keys. Same result as the collected shape —
    * [[PartitionedUpsertSpec]] pins the equivalence.
    */
  private[pipeline] def upsertByKeyDistributed(spark: SparkSession,
      dir: String, fresh: DataFrame, keyCol: String): Unit = {
    val buckets = fresh.select(col("_bucket")).distinct().collect()
      .map(_.getInt(0)).toSeq
    if (buckets.isEmpty) return
    val affected = spark.read.schema(fresh.schema).parquet(dir)
      .filter(col("_bucket").isin(buckets: _*))
    val kept = affected.join(fresh.select(col(keyCol)).distinct(),
      Seq(keyCol), "left_anti")
    val merged = kept.unionByName(fresh).localCheckpoint(true)
    merged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_bucket").parquet(dir)
  }

  /** Read the table back (bucket column dropped). `schema`, when the
    * caller knows the table's shape (data columns + `_bucket INT`),
    * skips the per-read schema-inference job — the streaming ingest
    * loops re-read their index tables every micro-batch.
    */
  def read(spark: SparkSession, dir: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s))
      .parquet(dir).drop("_bucket")
}
