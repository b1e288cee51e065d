package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The size-gated turn-merge operator: both paths produce identical rows
  * (the TurnMergeSpec null-equality property, re-pinned through the
  * wrapper), the gate's cheap tiers keep the fused plan for bounded
  * groups WITHOUT extra probe jobs, and a planted million-event hot key
  * takes the spilling window path — the safety property the kernel's own
  * doc prescribes, now enforced instead of advised.
  */
class TurnMergeOpSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def events = graft.Tables.load(spark, graft.TestSpark.sf, "events")

  private def normRows(df: org.apache.spark.sql.DataFrame) = df
    .select($"user_id", $"run_id", $"event_type", $"n_events",
      round($"sum_value", 6).as("sum_value"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) null else r.getString(2), r.getLong(3),
      if (r.isNullAt(4)) null else r.getDouble(4).asInstanceOf[AnyRef]))
    .sortBy(t => (t._1, t._2)).toSeq

  private def planOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.toString

  test("forced paths are row-identical on the events table") {
    val k = TurnMergeOp.merge(events, "user_id", "ts", "event_id",
      "event_type", "value", useKernel = Some(true))
    val w = TurnMergeOp.merge(events, "user_id", "ts", "event_id",
      "event_type", "value", useKernel = Some(false))
    assert(planOf(k).contains("Generate") && !planOf(k).contains("Window"))
    assert(planOf(w).contains("Window") && !planOf(w).contains("Generate"))
    assert(normRows(k) == normRows(w))
  }

  test("footer-hint tier keeps the fused plan with zero probe jobs") {
    val hint = graft.Tables.parquetRowCount(spark,
      s"${graft.TestSpark.sf}/events.parquet")
    assert(hint.isDefined && hint.get > 0)
    // the hint is below the bound → kernel, decided driver-side: the
    // choice must not run a single Spark job
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val df = TurnMergeOp.merge(events, "user_id", "ts", "event_id",
      "event_type", "value", totalRowsHint = hint)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "the hint tier must decide without a probe job")
    assert(planOf(df).contains("Generate") && !planOf(df).contains("Window"))
  }

  test("parquetRowCount answers None, never Some(0), for a nested layout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tmrc").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "cat")
      .write.partitionBy("cat").parquet(dir)
    // data lives in cat=*/ subdirs: a non-recursive footer walk cannot
    // see it — "can't tell" must not read as "zero rows" to a size gate
    // (Some(0) here would send a million-event table down the kernel path)
    assert(graft.Tables.parquetRowCount(spark, dir).isEmpty)
  }

  test("a large table whose groups are all small keeps the kernel (tier-3 probe)") {
    // hint ABOVE the bound forces the per-group probe; max group ≈ 40
    // rows, so the probe finds the kernel safe
    val df = TurnMergeOp.merge(events, "user_id", "ts", "event_id",
      "event_type", "value", maxKernelGroup = 500,
      totalRowsHint = Some(10000000L))
    assert(planOf(df).contains("Generate") && !planOf(df).contains("Window"))
  }

  test("a planted million-event hot key takes the spilling window path, identically") {
    // one speaker with 1.1M events (over the 2^20 bound): exactly the
    // corpus the kernel doc says must NOT be held as JVM objects
    val hot = spark.range(1100000L)
      .select(lit(7L).as("user_id"),
        timestamp_micros($"id" * 1000L).as("ts"),
        $"id".as("event_id"),
        concat(lit("k"), (($"id" / 1000L) % 3L).cast("string")).as("event_type"),
        (($"id" % 7L).cast("double") * 0.5).as("value"))
      .localCheckpoint(true)
    val gated = TurnMergeOp.merge(hot, "user_id", "ts", "event_id",
      "event_type", "value")
    assert(planOf(gated).contains("Window") && !planOf(gated).contains("Generate"),
      "the measured gate must route the hot key to the window form:\n" +
        planOf(gated).take(1500))
    // and the spilling path's output is what the kernel would have built
    val kernel = TurnMergeOp.merge(hot, "user_id", "ts", "event_id",
      "event_type", "value", useKernel = Some(true))
    assert(normRows(gated) == normRows(kernel),
      "window and kernel paths diverged on the hot-key corpus")
  }
}
