package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup
import graft.pipeline.PartitionedUpsert

/** Continuous corpus construction: a document stream is paragraph-deduped
  * against the ever-growing corpus fingerprint index, and both the kept
  * paragraphs and the index live in [[PartitionedUpsert]]'s hash-bucket
  * layout, so each micro-batch rewrites only the buckets it touches.
  *
  * This is the composition story at ingest scale: [[Dedup
  * .ingestNovelParagraphs]] (Bloom-gated membership against the persisted
  * index — definitely-novel paragraphs never shuffle) feeds
  * [[PartitionedUpsert.upsertByKey]] (only affected buckets rewritten).
  * The stream's checkpoint makes batch progress exactly-once; the
  * fingerprint key makes the sink idempotent under replays (a replayed
  * batch's paragraphs are all "already indexed" the second time).
  */
object StreamingIngest {

  private val Buckets = 64

  /** One AvailableNow pass over document files in `docsDir`: dedup each
    * micro-batch against the fingerprint index at `indexDir`, append the
    * novel paragraphs, and grow the index. Returns micro-batch count.
    */
  def runAvailableNow(spark: SparkSession, docsDir: String, indexDir: String,
      checkpointDir: String, paragraphs: Column,
      expectedKeys: Long = 1000000L): Long = {
    val schema = spark.read.parquet(docsDir).schema
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    var batches = 0L
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches += 1
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val haveIndex = graft.core.Fs.exists(s, indexDir)
          val indexFps =
            if (haveIndex) PartitionedUpsert.read(s, indexDir).select(col("_fp"))
            else s.emptyDataFrame.select(lit("").as("_fp")).filter(lit(false))
          val novel = Dedup.ingestNovelParagraphs(batch, "doc_id", paragraphs,
              indexFps, expectedKeys)
            .localCheckpoint(true) // one evaluation feeds index + payload
          if (!novel.isEmpty) {
            val entries = novel.select(col("_fp"), col("id").as("owner_id"),
              col("p_idx"), col("p_text"))
            if (haveIndex)
              PartitionedUpsert.upsertByKey(s, indexDir, entries, "_fp", Buckets)
            else
              PartitionedUpsert.writeInitial(entries, indexDir, "_fp", Buckets)
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }
}
