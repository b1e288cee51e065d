package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The bucketed interval join must (a) reproduce exactly the naive
  * inequality join's result on real events, and (b) plan as an equi-join —
  * never a cartesian product or broadcast nested loop, which is the whole
  * point of the bucketing.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = Tables.load(spark, TestSpark.sf, "events")
  private lazy val windows = events.filter($"event_id" % 100 === 0)
    .select($"event_id".as("window_id"), $"event_type", $"ts".as("ws"),
      ($"ts" + expr("INTERVAL 6 HOURS")).as("we"))
  private lazy val probes = events.select($"event_id", $"event_type", $"ts")

  test("matches the naive inequality join on real events") {
    val bucketed = RangeJoin.bucketedIntervalJoin(probes, windows,
        Seq("event_type"), "ts", "ws", "we", 6 * 3600L)
      .select($"window_id", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = probes.as("e").join(windows.as("w"),
        $"e.event_type" === $"w.event_type" && $"e.ts" >= $"ws" && $"e.ts" < $"we")
      .select($"window_id", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(bucketed.nonEmpty, "fixture must produce matches")
  }

  test("each matching pair is emitted exactly once (no dedup needed)") {
    val out = RangeJoin.bucketedIntervalJoin(probes, windows,
        Seq("event_type"), "ts", "ws", "we", 3600L) // buckets much smaller than span
      .groupBy($"window_id", $"event_id").count()
      .filter($"count" > 1).count()
    assert(out == 0L)
  }

  test("plans as an equi-join: no cartesian product, no nested loop") {
    val plan = RangeJoin.bucketedIntervalJoin(probes, windows,
        Seq("event_type"), "ts", "ws", "we", 6 * 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("sub-second interval bounds never drop the last covered bucket") {
    val iv = Seq((1L, "2024-01-01 00:00:00.2", "2024-01-01 00:00:10.7"))
      .toDF("window_id", "ws", "we")
      .select($"window_id", $"ws".cast("timestamp").as("ws"), $"we".cast("timestamp").as("we"))
    val pr = Seq((10L, "2024-01-01 00:00:10.5"), (11L, "2024-01-01 00:00:10.9"),
        (12L, "2023-12-31 23:59:59.9"), (13L, "2024-01-01 00:00:00.2"))
      .toDF("event_id", "ts")
      .select($"event_id", $"ts".cast("timestamp").as("ts"), lit("t").as("k"))
    val got = RangeJoin.bucketedIntervalJoin(pr, iv.withColumn("k", lit("t")),
        Seq("k"), "ts", "ws", "we", 5L)
      .select($"event_id").as[Long].collect().toSet
    // 10 is inside; 11 is past the exclusive end; 12 is before the start;
    // 13 sits exactly on the (inclusive) start instant
    assert(got == Set(10L, 13L))
  }
}
