package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Z-order layout: hand-checked bit interleave, the multi-column
  * pruning property (every slot's span on BOTH keys is a fraction of
  * global — single-column sorting leaves the other key unpruned), and
  * the slot-contiguous write.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave: hand-computed Morton codes") {
    // bucket values (a=0b101, b=0b011), 3 bits, a on the higher lane:
    // z = a2 b2 a1 b1 a0 b0 = 1 0 0 1 1 1 = 0b100111 = 39
    val df = Seq((5L, 3L)).toDF("a", "b")
      .withColumn("z", ZOrder.interleave(Seq(col("a"), col("b")), 3))
    assert(df.select($"z").head().getLong(0) == 39L)
    // single column degenerates to identity on the low bits
    val one = Seq((6L)).toDF("a")
      .withColumn("z", ZOrder.interleave(Seq(col("a")), 3))
    assert(one.select($"z").head().getLong(0) == 6L)
  }

  test("withZValue: both keys' per-slot spans shrink; sorted baseline does not") {
    // two independent uniform keys — the worst case for one-column sort
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, ((i.toLong * 2654435761L) % 4096 + 4096) % 4096)
    }.toDF("x", "y")
    val z = ZOrder.withZValue(df, Seq("x", "y"), bits = 8)
      .withColumn("slot", shiftright($"zval", 12)) // 16 slots: top 2 bits each
    val spans = z.groupBy($"slot")
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .collect()
    assert(spans.length == 16)
    // each slot pins the top 2 bits of both keys → span ≤ ~1/4 of 4096
    spans.foreach { r =>
      assert(r.getLong(1) <= 1100, s"slot ${r.get(0)} x-span ${r.getLong(1)}")
      assert(r.getLong(2) <= 1100, s"slot ${r.get(0)} y-span ${r.getLong(2)}")
    }
    // the x-sorted baseline: same 16-way split leaves y unclustered
    val sorted = df.orderBy($"x")
      .withColumn("slot", ($"x" / 256).cast("int"))
    val ySpans = sorted.groupBy($"slot").agg((max($"y") - min($"y")).as("sy"))
      .collect().map(_.getLong(1))
    assert(ySpans.forall(_ > 3000), "sorted-by-x slots must NOT cluster y")
  }

  test("footer-stats ranges reproduce the self-computed zvals bit-identically") {
    val orders = graft.Tables.load(spark, graft.TestSpark.sf, "orders")
      .select($"o_orderkey", $"o_custkey")
    val cols = Seq("o_custkey", "o_orderkey")
    val stats = graft.Tables.parquetLongStats(spark,
      s"${graft.TestSpark.sf}/orders.parquet", cols)
    assert(stats.isDefined, "orders footers must carry integral stats")
    // footer stats are exact: equal to the aggregate min/max
    val r = orders.agg(min($"o_custkey"), max($"o_custkey"),
      min($"o_orderkey"), max($"o_orderkey")).head()
    assert(stats.get("o_custkey") == ((r.getLong(0), r.getLong(1))))
    assert(stats.get("o_orderkey") == ((r.getLong(2), r.getLong(3))))
    val self = ZOrder.withZValue(orders, cols, 8)
      .select($"o_orderkey", $"zval").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val ranged = ZOrder.withZValue(orders, cols, 8, stats.get)
      .select($"o_orderkey", $"zval").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    assert(self.sameElements(ranged), "ranges overload must be bit-identical")
  }

  test("ranges narrower than the data clamp to edge buckets instead of corrupting the interleave") {
    val df = Seq(-5L, 0L, 3L, 7L, 12L).toDF("a")
    // supplied range [0, 7] misses -5 and 12 (stale-stats scenario)
    val z = ZOrder.withZValue(df, Seq("a"), bits = 3,
        Map("a" -> ((0L, 7L))))
      .select($"a", $"zval").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // in-range values bucket exactly as the arithmetic says: v*8 div 8 = v
    assert(z(0L) == 0L && z(3L) == 3L && z(7L) == 7L)
    // out-of-range values land in the EDGE buckets (never leak high bits)
    assert(z(-5L) == 0L, "below-range must clamp to bucket 0")
    assert(z(12L) == 7L, "above-range must clamp to the top bucket")
    assert(z.values.forall(v => v >= 0 && v < 8))
  }

  test("values FAR outside the range (multiply-overflow scenario) clamp to the correct edge") {
    // (v − mn)·2^bits overflows Long for v ≈ 2^61 at bits=3 — clamp-first
    // semantics must still land these in the intended edge buckets, not
    // wrap negative and clamp to the wrong side
    val df = Seq(Long.MaxValue / 4, Long.MinValue / 4, 3L).toDF("a")
    val z = ZOrder.withZValue(df, Seq("a"), bits = 3,
        Map("a" -> ((0L, 7L))))
      .select($"a", $"zval").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(z(Long.MaxValue / 4) == 7L, "huge above-range value must clamp to the TOP bucket")
    assert(z(Long.MinValue / 4) == 0L, "huge below-range value must clamp to bucket 0")
    assert(z(3L) == 3L)
  }

  test("empty input yields zero rows with the zval column present") {
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    val z = ZOrder.withZValue(empty, Seq("x", "y"), bits = 8)
    assert(z.columns.contains("zval") && z.count() == 0)
  }

  test("zOrderWrite: slot directories are z-contiguous and content-complete") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString + "/t"
    val df = (0 until 1000).map(i =>
      (i.toLong, (i.toLong * 37) % 1000)).toDF("x", "y")
    ZOrder.zOrderWrite(df, Seq("x", "y"), bits = 6, nSlots = 8, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.select($"x", $"y").distinct().count() == 1000)
    // slots partition the z-range contiguously: max z of slot s < min z
    // of slot s+1 (recompute zval on readback)
    val z = ZOrder.withZValue(back, Seq("x", "y"), bits = 6)
      .groupBy($"_slot").agg(min($"zval").as("mn"), max($"zval").as("mx"))
      .orderBy($"_slot").collect()
    z.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(1),
        s"slots ${a.get(0)} and ${b.get(0)} overlap in z")
      case _ =>
    }
  }
}
