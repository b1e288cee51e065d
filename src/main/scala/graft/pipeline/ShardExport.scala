package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The training-data final mile: materialize one epoch of the corpus as
  * numbered shard files in deterministic training order, with a manifest
  * a trainer (or the next pipeline stage) can trust without re-scanning
  * the data. Composes the proven pieces — [[graft.operators.Sampling
  * .epochShuffle]] decides (shard, pos) per document (md5-salted, so
  * every epoch is an independent permutation), `partitionBy(shard)`
  * writes each shard as its own directory, and the manifest aggregates
  * per shard: document count, token sum, and an order-sensitive checksum
  * (Σ pos·id — the sp7 convention, reproducible by any engine) that pins
  * BOTH membership and the within-shard order without storing either.
  *
  * Scale shape: one md5 projection + one (epoch,shard) window shuffle —
  * the same cost as epochShuffle itself; the manifest is an aggregate of
  * the written frame (ReusedExchange-friendly), ≤ nShards rows. Shard
  * directories are rewritten atomically per export (full overwrite of
  * the epoch dir); re-exporting the same epoch is byte-deterministic.
  */
object ShardExport {

  /** Write `epoch` of `df` to `outDir/epoch=<e>/shard=<s>/`, one
    * directory per shard, rows carrying their training position. Returns
    * the manifest (shard, n_docs, n_tokens, order_checksum) and writes
    * it to `outDir/epoch=<e>/_manifest` as parquet.
    */
  def exportEpoch(df: DataFrame, idCol: String, tokensCol: String,
      epoch: Int, nShards: Int, outDir: String): DataFrame = {
    require(epoch >= 0, "epoch must be >= 0")
    val spark = df.sparkSession
    val epochDir = s"$outDir/epoch=$epoch"
    // the single-epoch shuffle hashes "id:<epoch>" directly — exporting
    // epoch 50 costs the same one projection + window sort as epoch 0
    // (the exploded epochShuffle would materialize and hash 51 copies)
    val ordered = graft.operators.Sampling
      .singleEpochShuffle(df, idCol, epoch, nShards = nShards)
      .localCheckpoint(true) // one evaluation feeds the write AND the manifest
    ordered
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(epochDir)
    val manifest = ordered.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("n_tokens"),
        sum(col("pos").cast("long") * col(idCol).cast("long"))
          .as("order_checksum"))
      .orderBy(col("shard"))
      .localCheckpoint(true)
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$epochDir/_manifest")
    manifest
  }

  /** Read one shard back in training order. */
  def readShard(spark: SparkSession, outDir: String, epoch: Int,
      shard: Int): DataFrame =
    spark.read.parquet(s"$outDir/epoch=$epoch")
      .filter(col("shard") === shard)
      .orderBy(col("pos"))

  /** Verify a written epoch against its manifest without trusting either:
    * recompute the per-shard aggregates from the shard files and compare.
    * Returns true iff every shard matches (count, tokens, checksum).
    */
  def verifyEpoch(spark: SparkSession, outDir: String, epoch: Int,
      idCol: String, tokensCol: String): Boolean = {
    val epochDir = s"$outDir/epoch=$epoch"
    val p = new Path(s"$epochDir/_manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val manifest = spark.read.parquet(s"$epochDir/_manifest")
    val recomputed = spark.read.parquet(epochDir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("n_tokens"),
        sum(col("pos").cast("long") * col(idCol).cast("long"))
          .as("order_checksum"))
    manifest.count() == recomputed.count() &&
      manifest.join(recomputed,
        Seq("shard", "n_docs", "n_tokens", "order_checksum")).count() == manifest.count()
  }
}
