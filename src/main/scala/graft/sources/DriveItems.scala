package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.services.{Retry, RetryPolicy, RetryableException}

/** S6: drive-item resolve + content fetch as an exercised component
  * (behavior spec: /root/reference/jobs/sharepoint_graph_client.py:127-175).
  *
  * Spark shape: one client per PARTITION inside `mapPartitions` (connection
  * and auth amortized per task, like every service boundary in this repo),
  * with the shared [[Retry]] envelope handling 429 Retry-After throttling.
  * Items whose lookup 404s resolve to None and are dropped — the reference
  * returns None for 400/404 and skips, it does not fail the run.
  */
object DriveItems {

  /** The Graph-client boundary: resolve a list item to its drive item and
    * download its content. Implementations throw [[RetryableException]]
    * (with the server's Retry-After) on throttling.
    */
  trait DriveClient extends Serializable {
    /** None ⇔ the item has no drive item (404/400 lookup). */
    def resolveDriveItem(siteId: String, collectionId: String, itemId: String): Option[String]
    def download(driveItemRef: String): Array[Byte]
  }

  /** Deterministic in-process client for tests and gate fixtures: item ids
    * ending in "gone" 404, and every download throttles `throttleFirst`
    * times before succeeding — exercising the 429 path on every row.
    */
  final class SyntheticDriveClient(throttleFirst: Int = 2) extends DriveClient {
    private val attempts = scala.collection.mutable.HashMap.empty[String, Int]
    override def resolveDriveItem(siteId: String, collectionId: String,
        itemId: String): Option[String] =
      if (itemId.endsWith("gone")) None
      else Some(s"$siteId/$collectionId/$itemId/driveItem")
    override def download(ref: String): Array[Byte] = {
      val n = attempts.getOrElse(ref, 0)
      attempts.update(ref, n + 1)
      if (n < throttleFirst)
        throw new RetryableException(s"429 throttled: $ref", retryAfterMs = Some(0L))
      s"content-of:$ref".getBytes("UTF-8")
    }
  }

  /** Resolve + download content for (site_id, collection_id, item_id) rows.
    * Appends (drive_ref, content: binary); unresolvable items are dropped.
    * `mkClient` runs once per partition on the executor.
    */
  def fetchDriveItems(items: DataFrame, mkClient: () => DriveClient,
      policy: RetryPolicy = RetryPolicy(maxAttempts = 6, baseDelayMs = 1000,
        maxDelayMs = 30000, jitterMs = 0, jitterSeed = Some(0L)),
      sleeper: Long => Unit = Thread.sleep): DataFrame = {
    val schema = StructType(items.schema.fields ++ Seq(
      StructField("drive_ref", StringType),
      StructField("content", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val si = items.schema.fieldIndex("site_id")
    val ci = items.schema.fieldIndex("collection_id")
    val ii = items.schema.fieldIndex("item_id")
    items.mapPartitions { rows =>
      val client = mkClient() // one client per task
      rows.flatMap { r =>
        client.resolveDriveItem(r.getString(si), r.getString(ci), r.getString(ii))
          .map { ref =>
            val bytes = Retry.withRetry(policy, sleeper)(() => client.download(ref))
            Row.fromSeq(r.toSeq ++ Seq(ref, bytes))
          }
      }
    }(enc)
  }
}
