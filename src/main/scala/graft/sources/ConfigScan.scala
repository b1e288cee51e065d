package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8: job-configuration container scan (behavior spec:
  * /root/reference/tools/cosmosdb.py:21-37 `SELECT * FROM c` +
  * /root/reference/jobs/blob_storage_indexer.py:93-102 duck-typed
  * defaults).
  *
  * The reference stores per-job config documents in a schema-less
  * container and reads them with get-with-default for every field. Spark
  * shape: schema-on-read JSON scan + one normalizing projection that
  * applies the same defaults, so downstream operators always see a total,
  * typed config row regardless of which fields each document carries.
  */
object ConfigScan {

  /** Reference defaults (blob_storage_indexer.py:93-102). */
  val defaults: Map[String, Any] = Map(
    "source_container" -> "documents",
    "jobs_log_container" -> "jobs",
    "blob_prefix" -> "",
    "max_concurrency" -> 8,
    "batch_size" -> 500,
    "indexer_name" -> "blob-storage-indexer",
    "input_is_base64" -> false)

  /** Scan a config path (one JSON doc per job) and normalize with the
    * reference's defaults. `input_is_base64` accepts the reference's
    * permissive string forms ("true"/"1"/"yes", case-insensitive).
    */
  def loadJobConfigs(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    def strCol(name: String, default: String) =
      if (raw.columns.contains(name)) coalesce(col(name).cast("string"), lit(default))
      else lit(default)
    def intCol(name: String, default: Int) =
      if (raw.columns.contains(name)) coalesce(col(name).cast("int"), lit(default))
      else lit(default)
    val b64 =
      if (raw.columns.contains("input_is_base64"))
        lower(coalesce(col("input_is_base64").cast("string"), lit("false")))
          .isin("true", "1", "yes")
      else lit(false)
    raw.select(
      coalesce(col("id").cast("string"), lit("")).as("id"),
      strCol("source_container", "documents").as("source_container"),
      strCol("jobs_log_container", "jobs").as("jobs_log_container"),
      strCol("blob_prefix", "").as("blob_prefix"),
      intCol("max_concurrency", 8).as("max_concurrency"),
      intCol("batch_size", 500).as("batch_size"),
      strCol("indexer_name", "blob-storage-indexer").as("indexer_name"),
      b64.as("input_is_base64"))
  }
}
