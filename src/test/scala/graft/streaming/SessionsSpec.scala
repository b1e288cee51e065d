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
}
