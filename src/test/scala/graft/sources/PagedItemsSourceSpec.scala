package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PagedItemsSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def read(pages: Int = 4, pageSize: Int = 100) =
    spark.read.format("graft.sources.PagedItemsSource")
      .option("pages", pages).option("pageSize", pageSize).load()

  test("scan yields pages × pageSize deterministic rows") {
    val df = read(4, 100)
    assert(df.count() == 400)
    assert(df.select("item_id").distinct().count() == 400)
    // deterministic across reads
    assert(read(4, 100).agg(sum("modified_ms")).head().getLong(0) ==
      df.agg(sum("modified_ms")).head().getLong(0))
  }

  test("one input partition per page (S4 paged parallelism)") {
    assert(read(7, 10).rdd.getNumPartitions == 7)
  }

  test("filter pushdown reaches the scan and preserves semantics (F10)") {
    import spark.implicits._
    val full = read(4, 200).cache()
    val pushed = read(4, 200).filter($"site" === "site3" && $"modified_ms" > 1703000000000L)
    val manual = full.collect().filter(r =>
      r.getAs[String]("site") == "site3" && r.getAs[Long]("modified_ms") > 1703000000000L)
    assert(pushed.count() == manual.length)
    val planStr = pushed.queryExecution.executedPlan.toString
    assert(planStr.contains("PagedItemsScan"), planStr)
    assert(planStr.contains("pushed=[") && planStr.contains("EqualTo(site,site3)"),
      s"filters not pushed: $planStr")
  }

  test("column pruning reaches the scan ($select analog)") {
    import spark.implicits._
    val pruned = read(2, 50).select($"item_id", $"site")
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("cols=[item_id,site]"), s"columns not pruned: $planStr")
    assert(pruned.columns.toSeq == Seq("item_id", "site"))
    assert(pruned.count() == 100)
  }

  test("non-pushable predicates still apply in Spark") {
    import spark.implicits._
    val df = read(2, 100).filter(length($"title") > 12)
    val expected = read(2, 100).collect().count(_.getAs[String]("title").length > 12)
    assert(df.count() == expected)
  }
}
