package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** As-of join semantics pinned against a hand-computed fixture plus a
  * naive-join equivalence sweep on real data, and the plan shape asserted:
  * the merge must shuffle ONCE on the key (no join node at all).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("inclusive as-of semantics, ties to latest tiebreak, unmatched null") {
    val left = Seq((1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 15L, "e3"),
      (2L, 7L, "e4")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L, 1.0), (1L, 10L, 101L, 2.0),
      (1L, 12L, 102L, 3.0), (3L, 1L, 103L, 4.0))
      .toDF("k", "rt", "ref", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt",
        payload = Seq("ref", "v"), rightOrder = Some("ref"))
      .select("tag", "ref", "v")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out("e1") == (None, None))                 // before any right row
    assert(out("e2") == (Some(101L), Some(2.0)))      // inclusive, max-ref tie
    assert(out("e3") == (Some(102L), Some(3.0)))      // latest <= 15
    assert(out("e4") == (None, None))                 // key with no right rows
  }

  test("payload struct is row-atomic even with null payload fields") {
    val left = Seq((1L, 20L)).toDF("k", "t")
    // later right row has a NULL v; a per-column carry would resurrect 9.0
    val right = Seq((1L, 5L, Some(9.0), "a"), (1L, 10L, None, "b"))
      .toDF("k", "rt", "v", "s")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v", "s"))
      .select("v", "s").collect().head
    assert(out.isNullAt(0) && out.getString(1) == "b")
  }

  test("equivalence with the naive join+max plan on real events") {
    val events = graft.Tables.load(spark, graft.TestSpark.sf, "events")
      .filter($"event_id" < 2000)
      .select($"event_id", $"user_id", $"ts".cast("long").as("t"))
    val refs = events.filter($"event_id" % 10 === 0)
      .select($"user_id", $"t".as("rt"), $"event_id".as("ref"))
    val probes = events.filter($"event_id" % 10 =!= 0)

    val fast = AsOfJoin.asOf(probes, refs, "user_id", "t", "rt",
        payload = Seq("ref"), rightOrder = Some("ref"))
      .select($"event_id", $"ref")

    // conditional max so probes with refs only in the future (or none at
    // all) still surface with a null ref, matching left-join semantics
    val naive = probes.join(refs, Seq("user_id"), "left")
      .groupBy($"event_id")
      .agg(max(when($"rt" <= $"t", struct($"rt", $"ref")))
        .getField("ref").as("ref"))

    val diff = fast.exceptAll(naive).count() + naive.exceptAll(fast).count()
    assert(diff == 0, s"as-of merge disagrees with naive join on $diff rows")
  }

  test("plan: single shuffle on the key, no join operator") {
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, 3L, 7L)).toDF("k", "rt", "p")
    val plan = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly 1 key shuffle, got $shuffles:\n$plan")
  }
}
