package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The fused `turn_merge` kernel must be row-identical to the declarative
  * lag → running-sum → groupBy spec it replaces — including the null
  * edges the a7 table never exercises: a null FIRST key (run_id starts
  * at 0, not 1 — the lag seed is null and `null <=> null` holds), null
  * keys mid-stream (null-safe continuation), all-null-value runs (sum is
  * NULL, not 0.0), and null array elements (skipped).
  */
class TurnMergeSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def declarative(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    df.withColumn("chg",
        when(lag($"event_type", 1).over(w) <=> $"event_type", lit(0))
          .otherwise(lit(1)))
      .withColumn("run_id",
        sum($"chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"run_id", $"event_type")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
      .select($"user_id", $"run_id", $"event_type", $"n_events", $"sum_value")
  }

  private def fused(df: org.apache.spark.sql.DataFrame) = {
    GraftFunctions.register(spark)
    df.groupBy($"user_id")
      .agg(collect_list(struct($"ts", $"event_id", $"event_type", $"value")).as("evs"))
      .select($"user_id", GraftFunctions.turn_merge($"evs").as(
        Seq("run_id", "event_type", "n_events", "sum_value")))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) null else r.getString(2), r.getLong(3),
      if (r.isNullAt(4)) null else r.getDouble(4).asInstanceOf[AnyRef]))
    .sortBy(t => (t._1, t._2)).toSeq

  test("null-laden corpus: fused kernel ≡ declarative window form") {
    // user 1: null FIRST key, then a,a, then null,null again (run_ids 0,1,2)
    // user 2: all-null values inside one run (sum must be NULL)
    // user 3: plain runs with a mid-stream null value (sum skips it)
    val df = Seq[(Long, Long, Long, Option[String], Option[Double])](
      (1L, 10L, 1L, None, Some(1.0)),
      (1L, 20L, 2L, Some("a"), Some(2.0)),
      (1L, 30L, 3L, Some("a"), Some(3.0)),
      (1L, 40L, 4L, None, Some(4.0)),
      (1L, 50L, 5L, None, Some(5.0)),
      (2L, 10L, 1L, Some("x"), None),
      (2L, 20L, 2L, Some("x"), None),
      (2L, 30L, 3L, Some("y"), Some(7.0)),
      (3L, 10L, 1L, Some("p"), Some(1.5)),
      (3L, 20L, 2L, Some("p"), None),
      (3L, 30L, 3L, Some("q"), Some(2.5))
    ).toDF("user_id", "raw_ts", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros($"raw_ts" * 1000000L))
      .drop("raw_ts")
    val want = rows(declarative(df))
    val got = rows(fused(df))
    assert(got == want,
      s"fused diverged from declarative:\n got=$got\nwant=$want")
    // the null-first-key group really does start at run_id 0
    assert(want.filter(_._1 == 1L).map(_._2) == Seq(0L, 1L, 2L))
    // the all-null-value run really does sum to NULL
    assert(want.exists(t => t._1 == 2L && t._3 == "x" && t._5 == null))
  }

  test("null ts sorts NULLS FIRST — before a pre-1970 negative timestamp") {
    // user 1: a null-ts event and a negative-µs (pre-1970) event share a
    // key; the declarative window orders the null FIRST (Spark ascending
    // default), so the null-ts row OPENS the run — a kernel coercing
    // null to 0 would order it after the negative row and, with the 'b'
    // row between them, segment differently
    val df = Seq[(Long, Option[Long], Long, Option[String], Option[Double])](
      (1L, None, 1L, Some("a"), Some(1.0)),
      (1L, Some(-5L), 2L, Some("b"), Some(2.0)),
      (1L, Some(3L), 3L, Some("a"), Some(3.0)),
      (2L, None, 1L, Some("x"), Some(4.0)),
      (2L, None, 2L, Some("x"), Some(5.0))
    ).toDF("user_id", "raw_s", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros($"raw_s" * 1000000L))
      .drop("raw_s")
    assert(rows(fused(df)) == rows(declarative(df)),
      "kernel must order null ts NULLS FIRST like the window")
    // the two null-ts 'x' rows fold into ONE run ordered by event_id
    val u2 = rows(fused(df)).filter(_._1 == 2L)
    assert(u2 == Seq((2L, 1L, "x", 2L, 9.0: java.lang.Double)))
  }

  test("randomized property: 60 null-laden groups, fused ≡ declarative") {
    // deterministic pseudo-random corpus: every group draws sizes, key
    // alphabets, null rates and ts ties from a seeded RNG — one batched
    // comparison covers all groups in two Spark queries
    val rnd = new scala.util.Random(42)
    val rows = (1L to 60L).flatMap { uid =>
      val n = 1 + rnd.nextInt(12)
      (1 to n).map { i =>
        val ts: Option[Long] =
          if (rnd.nextInt(10) == 0) None
          else Some(rnd.nextInt(5).toLong - 2) // few distinct values → ties
        val key: Option[String] =
          if (rnd.nextInt(5) == 0) None else Some(("abc" (rnd.nextInt(3))).toString)
        val value: Option[Double] =
          if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(100) / 10.0)
        (uid, ts, i.toLong, key, value)
      }
    }
    val df = rows.toDF("user_id", "raw_s", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros($"raw_s" * 1000000L))
      .drop("raw_s")
    val want = rows2(declarative(df))
    val got = rows2(fused(df))
    assert(got == want, {
      val diff = (got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)
      s"fused diverged on ${diff.size} rows, e.g. ${diff.take(5)}"
    })
  }

  // like rows() but total-ordered for multi-run-per-user corpora
  private def rows2(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) null else r.getString(2), r.getLong(3),
      if (r.isNullAt(4)) null else r.getDouble(4).asInstanceOf[AnyRef]))
    .sortBy(t => (t._1, t._2, String.valueOf(t._3))).toSeq

  test("null array elements are skipped, empty groups emit nothing") {
    GraftFunctions.register(spark)
    // a generator in a SELECT emits its element schema as columns
    val out = spark.sql(
      """SELECT graft_turn_merge(array(
        |  named_struct('ts', timestamp_micros(1000000L), 'event_id', 1L,
        |               'key', 'a', 'value', 2.0D),
        |  CAST(NULL AS struct<ts:timestamp,event_id:bigint,key:string,value:double>),
        |  named_struct('ts', timestamp_micros(2000000L), 'event_id', 2L,
        |               'key', 'a', 'value', 3.0D)))
        |""".stripMargin)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getString(1) == "a" &&
      r.getLong(2) == 2L && r.getDouble(3) == 5.0)
    val empty = spark.sql(
      "SELECT graft_turn_merge(CAST(array() AS array<struct<ts:timestamp,event_id:bigint,key:string,value:double>>))")
      .collect()
    assert(empty.isEmpty)
  }
}
