package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** transformWithState (arbitrary state v2): running ValueState counter +
  * bounded ListState recent-window per key, across micro-batches, on the
  * RocksDB state store provider the operator requires.
  */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("value + list state persist across micro-batches; list window stays bounded") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val input = MemoryStream[(Long, Long)](spark)
      val q = Sessions.userProfiles(input.toDS(), recentK = 3)
        .writeStream.outputMode("update").format("memory")
        .queryName("graft_tws").start()
      try {
        input.addData((1L, 100L), (1L, 200L), (2L, 50L))
        q.processAllAvailable()
        val b1 = spark.table("graft_tws").collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getSeq[Long](3))))
          .toMap
        assert(b1(1L) == (2L, 200L, Seq(100L, 200L)))
        assert(b1(2L) == (1L, 50L, Seq(50L)))

        // batch 2: counter accumulates, window keeps only the last 3,
        // late timestamp doesn't regress last_ts_ms
        input.addData((1L, 300L), (1L, 250L), (1L, 150L))
        q.processAllAvailable()
        val b2 = spark.table("graft_tws")
          .groupBy($"user_id").agg(max($"n_events").as("n")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(b2(1L) == 5L)
        val rows = spark.table("graft_tws")
          .filter($"user_id" === 1L && $"n_events" === 5L).collect()
        assert(rows.head.getLong(2) == 300L)
        assert(rows.head.getSeq[Long](3) == Seq(150L, 250L, 300L),
          "recent window = last 3 batch-sorted timestamps")
      } finally q.stop()
    }
  }

  test("restart from checkpoint resumes state (exactly-once counter)") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-ckpt").toString
      val input = MemoryStream[(Long, Long)](spark)
      TransformWithStateSpec.seen.clear()
      def start() = Sessions.userProfiles(input.toDS(), recentK = 2)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Sessions.KeyProfile], _: Long) =>
          batch.collect().foreach(TransformWithStateSpec.seen.add)
        }
        .start()

      val q1 = start()
      input.addData((7L, 10L), (7L, 20L))
      q1.processAllAvailable()
      q1.stop()

      val q2 = start()
      input.addData((7L, 30L))
      q2.processAllAvailable()
      try {
        val latest = TransformWithStateSpec.seen.toArray(Array.empty[Sessions.KeyProfile])
          .maxBy(_.n_events)
        assert(latest.n_events == 3L, "counter resumes at 2 and reaches 3")
        assert(latest.recent_ts == Seq(20L, 30L))
      } finally q2.stop()
    }
  }
}

object TransformWithStateSpec {
  // foreachBatch closures run on the driver; a JVM-shared sink survives
  // the query restart the test performs
  val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Sessions.KeyProfile]()
}
