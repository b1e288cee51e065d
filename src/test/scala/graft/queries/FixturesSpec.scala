package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The fixture memo is correctness-bearing: every gate that uses it
  * assumes the cached build is (a) reused — the bench rationale — and
  * (b) byte-identical to a fresh build — the oracle rationale. Pin both,
  * plus key isolation (different sfDirs must never share a fixture).
  */
class FixturesSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("cached: one build per key, reused instance, content = fresh build") {
    import spark.implicits._
    var builds = 0
    def build() = { builds += 1; spark.range(100).select($"id", md5($"id".cast("string")).as("h")) }
    val a = Fixtures.cached(spark, "spec:one")(build())
    val b = Fixtures.cached(spark, "spec:one")(build())
    assert(builds == 1 && (a eq b))
    val fresh = spark.range(100).select($"id", md5($"id".cast("string")).as("h"))
    assert(a.exceptAll(fresh).isEmpty && fresh.exceptAll(a).isEmpty)
  }

  test("cached: keys isolate — different sfDir-style keys build separately") {
    import spark.implicits._
    val a = Fixtures.cached(spark, "spec:dirA")(Seq(1).toDF("x"))
    val b = Fixtures.cached(spark, "spec:dirB")(Seq(2).toDF("x"))
    assert(a.head().getInt(0) == 1 && b.head().getInt(0) == 2)
  }

  test("cachedObj: one build per key, reused reference") {
    var builds = 0
    case class Ix(v: Int)
    val a = Fixtures.cachedObj(spark, "spec:obj") { builds += 1; Ix(7) }
    val b = Fixtures.cachedObj(spark, "spec:obj") { builds += 1; Ix(8) }
    assert(builds == 1 && a == Ix(7) && (b == a))
  }
}
