package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.services.{Retry, RetryPolicy}

/** S6 drive-item fetch: per-partition client, 429 retry envelope, 404 drop
  * (sharepoint_graph_client.py:127-175).
  */
class DriveItemsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("throttled downloads retry exactly throttleFirst times, then succeed") {
    val client = new DriveItems.SyntheticDriveClient(throttleFirst = 3)
    val ref = client.resolveDriveItem("s", "c", "item1").get
    var sleeps = 0
    val policy = RetryPolicy(maxAttempts = 6, jitterMs = 0, jitterSeed = Some(0L))
    val bytes = Retry.withRetry(policy, _ => sleeps += 1)(() => client.download(ref))
    assert(new String(bytes, "UTF-8") == s"content-of:$ref")
    assert(sleeps == 3, "one sleep per 429")
  }

  test("exhausted retries propagate the throttling failure") {
    val client = new DriveItems.SyntheticDriveClient(throttleFirst = 99)
    val ref = client.resolveDriveItem("s", "c", "item2").get
    val policy = RetryPolicy(maxAttempts = 3, jitterMs = 0, jitterSeed = Some(0L))
    val e = intercept[graft.services.RetryableException] {
      Retry.withRetry(policy, _ => ())(() => client.download(ref))
    }
    assert(e.getMessage.contains("429"))
  }

  test("distributed fetch: 404 items dropped, content appended, per-task client") {
    import spark.implicits._
    val items = Seq(
      ("siteA", "list1", "doc1"),
      ("siteA", "list1", "doc2gone"), // resolves to None → dropped
      ("siteB", "list2", "doc3"))
      .toDF("site_id", "collection_id", "item_id")
    val out = DriveItems.fetchDriveItems(items,
      () => new DriveItems.SyntheticDriveClient(throttleFirst = 1))
    val rows = out.collect().map(r =>
      (r.getString(2), new String(r.getAs[Array[Byte]](4), "UTF-8"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("doc1", "doc3"))
    assert(rows.head._2 == "content-of:siteA/list1/doc1/driveItem")
  }

  test("config scan applies reference defaults to sparse documents") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg")
    java.nio.file.Files.writeString(dir.resolve("a.json"),
      """{"id":"a","batch_size":42,"input_is_base64":"TRUE"}""")
    java.nio.file.Files.writeString(dir.resolve("b.json"), """{"id":"b"}""")
    val cfg = ConfigScan.loadJobConfigs(spark, dir.toString + "/*.json")
      .orderBy("id").collect()
    assert(cfg.length == 2)
    val a = cfg(0)
    assert(a.getAs[Int]("batch_size") == 42 && a.getAs[Boolean]("input_is_base64"))
    val b = cfg(1)
    assert(b.getAs[Int]("batch_size") == 500 &&
      b.getAs[Int]("max_concurrency") == 8 &&
      b.getAs[String]("indexer_name") == "blob-storage-indexer" &&
      !b.getAs[Boolean]("input_is_base64"))
  }
}
