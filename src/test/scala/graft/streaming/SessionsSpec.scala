package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("batch gap sessionization: session counts and durations") {
    import spark.implicits._
    val events = graft.Tables.load(spark, TestSpark.sf, "events")
    val stats = Sessions.gapSessionStats(events, gapSeconds = 1800).cache()
    assert(stats.count() > 0)
    // every user appears exactly once with >= 1 session
    assert(stats.filter($"n_sessions" < 1).count() == 0)
    val users = events.select("user_id").distinct().count()
    assert(stats.count() == users)
  }

  test("dropDuplicatesWithinWatermark: replays drop, state ages out") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long)](spark)
    val q = Sessions.dedupedArrivals(input.toDS(), watermarkDelay = "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_dedup_stream").start()
    try {
      // batch 1: doc 1 twice (in-batch replay), doc 2 once
      input.addData((1L, 1_000L), (1L, 2_000L), (2L, 3_000L))
      q.processAllAvailable()
      // batch 2: doc 1 replays within the watermark → dropped; doc 3 new
      input.addData((1L, 4_000L), (3L, 5_000L))
      q.processAllAvailable()
      val got = spark.table("graft_dedup_stream")
        .groupBy($"doc_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == Set(1L, 2L, 3L))
      assert(got.values.forall(_ == 1L), s"each key must survive exactly once: $got")

      // advance event time far past the watermark so doc 1's dedup state
      // ages out, then replay it: the SAME key passes again — bounded
      // state trades unbounded-history dedup for exactly-once-per-window
      input.addData((99L, 100_000L))
      q.processAllAvailable()
      input.addData((1L, 101_000L))
      q.processAllAvailable()
      val doc1 = spark.table("graft_dedup_stream").filter($"doc_id" === 1L).count()
      assert(doc1 == 2L, "aged-out key must be admitted again")
    } finally q.stop()
  }

  test("mapGroupsWithState carries per-user state across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long)](spark)
    val q = Sessions.runningUserCounts(input.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("graft_user_state").start()
    try {
      input.addData((1L, 100L), (1L, 200L), (2L, 50L))
      q.processAllAvailable()
      val afterB1 = spark.table("graft_user_state")
        .groupBy($"user_id").agg(max($"n_events").as("n"), max($"last_ts_ms").as("ts"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(afterB1(1L) == (2L, 200L))
      assert(afterB1(2L) == (1L, 50L))

      // second micro-batch: counts accumulate, stale timestamps don't regress
      input.addData((1L, 150L), (2L, 500L), (3L, 10L))
      q.processAllAvailable()
      val afterB2 = spark.table("graft_user_state")
        .groupBy($"user_id").agg(max($"n_events").as("n"), max($"last_ts_ms").as("ts"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(afterB2(1L) == (3L, 200L))
      assert(afterB2(2L) == (2L, 500L))
      assert(afterB2(3L) == (1L, 10L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits sessions closed by a gap, across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long)](spark)
    val q = Sessions.closedGapSessions(input.toDS(), gapMs = 5000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_closed_sessions").start()
    try {
      // batch 1: one open session per user — nothing closes yet
      input.addData((1L, 0L), (1L, 1000L), (2L, 500L))
      q.processAllAvailable()
      assert(spark.table("graft_closed_sessions").count() == 0)

      // batch 2: user 1 jumps past the gap → their first session closes;
      // user 2 stays within the gap → still open
      input.addData((1L, 100000L), (2L, 3000L))
      q.processAllAvailable()
      val closed = spark.table("graft_closed_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(closed.toSeq == Seq((1L, 0L, 1000L, 2L)))

      // batch 3: user 2 jumps too → their (extended) session closes
      input.addData((2L, 900000L))
      q.processAllAvailable()
      val closed2 = spark.table("graft_closed_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(closed2 == Set((1L, 0L, 1000L, 2L), (2L, 500L, 3000L, 2L)))
    } finally q.stop()
  }

  test("structured streaming session_window agrees with batch on totals") {
    import spark.implicits._
    val out = Sessions.streamingSessionCounts(spark, TestSpark.sf, gap = "30 minutes",
      queryName = "graft_sessions_test")
    val streamTotal = out.agg(sum($"n_events")).head().getLong(0)
    val batchTotal = graft.Tables.load(spark, TestSpark.sf, "events").count()
    assert(streamTotal == batchTotal)
    // session structure: no user has more sessions than events
    val bad = out.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .join(graft.Tables.load(spark, TestSpark.sf, "events")
        .groupBy($"user_id").agg(count(lit(1)).as("ne")), "user_id")
      .filter($"n" > $"ne").count()
    assert(bad == 0)
  }

  test("watermarked tumbling window: append emits once, late data is dropped") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long)](spark)
    val q = Sessions.tumblingWindowCounts(input.toDS(),
      windowDur = "1 minute", watermarkDelay = "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_tumbling").start()
    def rows(): Map[Long, Long] = spark.table("graft_tumbling").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      // batch 1: two events in window [0,60s), one at 120s pushing the
      // watermark to 110s — processAllAvailable runs the follow-up batch
      // that finalizes [0,60s); the open [120s,180s) window must NOT emit
      input.addData((1L, 10000L), (2L, 20000L), (1L, 120000L))
      q.processAllAvailable()
      assert(rows() == Map(0L -> 2L), "only the watermark-passed window may emit: " + rows())

      // batch 2: a late event at 30s (< watermark 110s) MUST be dropped —
      // the already-finalized [0,60s) row cannot change or re-emit
      input.addData((3L, 30000L), (2L, 130000L))
      q.processAllAvailable()
      assert(rows() == Map(0L -> 2L), "late event leaked into a closed window: " + rows())

      // advance far: [120s,180s) finalizes with events 120s + 130s
      input.addData((1L, 400000L))
      q.processAllAvailable()
      assert(rows() == Map(0L -> 2L, 120000L -> 2L))
    } finally q.stop()
  }

  test("stream-stream interval join: matches inside the window, across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val imps = MemoryStream[(Long, Long)](spark)
    val clks = MemoryStream[(Long, Long)](spark)
    val q = Sessions.intervalJoin(imps.toDS(), clks.toDS(),
      joinWindowSec = 30L, watermarkDelay = "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_ssjoin").start()
    def pairs(): Set[(Long, Long, Long)] = spark.table("graft_ssjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    try {
      // impression for key 1 at t=10s, key 2 at t=12s
      imps.addData((1L, 10_000L), (2L, 12_000L))
      q.processAllAvailable()
      // clicks: key 1 inside the 30s window; key 2 outside it (50s gap);
      // key 3 has no impression at all
      clks.addData((1L, 25_000L), (2L, 62_000L), (3L, 20_000L))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 10_000L, 25_000L)))

      // a click in a LATER batch still joins a buffered impression, as
      // long as it lands inside the join window
      clks.addData((2L, 40_000L))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 10_000L, 25_000L), (2L, 12_000L, 40_000L)))

      // a click before its impression never matches (clk_ts >= imp_ts)
      imps.addData((4L, 90_000L))
      clks.addData((4L, 80_000L))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 10_000L, 25_000L), (2L, 12_000L, 40_000L)))
    } finally q.stop()
  }
}
