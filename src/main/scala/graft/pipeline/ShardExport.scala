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

  /** WebDataset-style delivery: one epoch materialized as numbered
    * `.tar` shard files ([[graft.formats.Tar]] — byte-deterministic
    * USTAR), members named `<pos>-<id>.txt` in training order. The tar
    * bytes are a pure function of membership + order + content, so the
    * returned manifest's (n_docs, tar_bytes, tar_md5) pins all three —
    * tar_bytes is plain arithmetic over member sizes
    * ([[graft.formats.Tar.archiveBytes]]), which is what lets the sp12
    * SQL oracle recompute it without ever building a tar.
    *
    * Scale shape: the same single-epoch shuffle as [[exportEpoch]], one
    * repartition on shard, and each task STREAMS its shards' members in
    * (shard, pos) order into the archive on the task-local filesystem
    * API — one shard's members live in memory while its tar assembles
    * (size a shard accordingly via nShards, as every WebDataset writer
    * does).
    */
  def exportTarShards(df: DataFrame, idCol: String, textCol: String,
      epoch: Int, nShards: Int, outDir: String): DataFrame = {
    require(epoch >= 0 && nShards >= 1)
    val spark = df.sparkSession
    val epochDir = s"$outDir/epoch=$epoch"
    val epochPath = new Path(epochDir)
    epochPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(epochPath)
    val ordered = graft.operators.Sampling
      .singleEpochShuffle(df.select(col(idCol).cast("long").as("id"),
        col(textCol).as("text")), "id", epoch, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("shard", IntegerType), StructField("n_docs", LongType),
      StructField("tar_bytes", LongType), StructField("tar_md5", StringType)))
    val manifest = ordered.mapPartitions { rows =>
      val done = Seq.newBuilder[Row]
      var shard = -1
      var entries = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
      def flush(): Unit = if (shard >= 0) {
        val tar = graft.formats.Tar.archive(entries.toSeq)
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(tar).map(b => f"$b%02x").mkString
        val path = new Path(f"$epochDir/shard-$shard%05d.tar")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(path, true)
        try out.write(tar) finally out.close()
        done += Row(shard, entries.length.toLong, tar.length.toLong, md5)
        entries = scala.collection.mutable.ArrayBuffer.empty
      }
      rows.foreach { r =>
        val s = r.getAs[Int]("shard")
        if (s != shard) { flush(); shard = s }
        val text = Option(r.getAs[String]("text")).getOrElse("")
        entries += ((f"${r.getAs[Int]("pos")}%08d-${r.getAs[Long]("id")}.txt",
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
      flush()
      done.result().iterator
    }(Encoders.row(outSchema))
    manifest.orderBy(col("shard"))
  }

  /** Recompute every tar shard's manifest row from the written files —
    * membership, order, AND bytes verified without trusting either side.
    */
  def verifyTarEpoch(spark: SparkSession, outDir: String, epoch: Int,
      manifest: DataFrame): Boolean = {
    val epochDir = s"$outDir/epoch=$epoch"
    val rows = manifest.collect()
    rows.forall { m =>
      // ANY read failure is a verification failure, not an exception —
      // on a checksummed filesystem a corrupted shard surfaces as a
      // ChecksumException before the bytes even reach the md5 compare
      try {
        val path = new Path(f"$epochDir/shard-${m.getInt(0)}%05d.tar")
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(path)) false
        else {
          val bytes = new Array[Byte](fs.getFileStatus(path).getLen.toInt)
          val in = fs.open(path)
          try in.readFully(0, bytes) finally in.close()
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map(b => f"$b%02x").mkString
          graft.formats.Tar.list(bytes) match {
            case Some(members) =>
              members.length.toLong == m.getLong(1) &&
                bytes.length.toLong == m.getLong(2) && md5 == m.getString(3) &&
                members.map(_._1) == members.map(_._1).sorted // pos-prefixed names
            case None => false
          }
        }
      } catch { case scala.util.control.NonFatal(_) => false }
    }
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
    // both sides are ≤ nShards rows: ONE collect each, compared as sorted
    // tuples on the driver — the old shape paid two schema-inference jobs
    // plus three count/join jobs for the same comparison (r19)
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(r.fieldIndex("shard")), r.getLong(r.fieldIndex("n_docs")),
        r.getLong(r.fieldIndex("n_tokens")),
        r.getLong(r.fieldIndex("order_checksum")))
    val manifest = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "shard INT, n_docs BIGINT, n_tokens BIGINT, order_checksum BIGINT"))
      .parquet(s"$epochDir/_manifest").collect().map(key).sortBy(_._1)
    val recomputed = spark.read.parquet(epochDir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("n_tokens"),
        sum(col("pos").cast("long") * col(idCol).cast("long"))
          .as("order_checksum"))
      .collect().map(key).sortBy(_._1)
    manifest.length == recomputed.length &&
      manifest.sameElements(recomputed)
  }
}
