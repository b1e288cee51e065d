package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact per-key interpolated quantiles of an integer-valued column in ONE
  * distributed pass (the corpus length-distribution profile of t9 — the
  * reference computes chunk/token length stats per run the same way,
  * jobs/blob_storage_indexer.py:324-338, just not at quantile precision).
  *
  * The declarative form (`groupBy(key).agg(percentile(v, p))`) buffers every
  * raw value per group and pays two shuffles under AQE (partial→final agg,
  * then the action's own stage) — three scheduler-floor-bound jobs for ~5 ms
  * of data work at bench scale. For an INTEGER-valued column the full
  * distribution compresses losslessly to a (key, value) → count histogram,
  * which is:
  *
  *   - mergeable (counts add), so one `rdd.aggregate` computes the exact
  *     histogram in a single job with per-partition combine;
  *   - bounded by the value domain, not the row count: doc-length-like
  *     columns have at most ~max_len distinct values per key, so at 100 TB
  *     the merged histogram is `|keys| × |value domain|` entries — an
  *     explicit `maxBins` guard aborts the driver-side merge beyond that
  *     and falls back to the declarative shuffle form, which buffers raw
  *     values but never materializes them on the driver.
  *
  * Interpolation matches `percentile` / DuckDB `quantile_cont` exactly:
  * rank h = (n−1)·p on the sorted multiset, result = v⌊h⌋ + (h−⌊h⌋)·(v⌊h⌋₊₁ −
  * v⌊h⌋). The spec pins this equal to the declarative plan's doubles on the
  * real tables (both paths, all SFs), including the null-handling corner:
  * `n` counts every row (`count(*)`), quantiles skip null values
  * (`percentile` semantics), an all-null key yields null quantiles.
  */
object ExactQuantiles {

  /** Thrown inside tasks when the histogram outgrows `maxBins`; callers of
    * [[byKeyHistogram]] never see it (it triggers the declarative fallback).
    */
  private final class BinsExceeded(bins: Long)
    extends RuntimeException(s"histogram exceeded maxBins=$bins")

  /** Per-partition (and merged) state: value histogram per key + null-row
    * counts per key. Plain mutable maps; merged associatively.
    */
  private final class Hist extends Serializable {
    val bins = new java.util.HashMap[(String, Long), Long]()
    val nulls = new java.util.HashMap[String, Long]()
    def addValue(k: String, v: Long, c: Long, maxBins: Int): Unit = {
      val key = (k, v)
      bins.put(key, bins.getOrDefault(key, 0L) + c)
      if (bins.size > maxBins) throw new BinsExceeded(maxBins)
    }
    def addNull(k: String, c: Long, maxBins: Int): Unit = {
      nulls.put(k, nulls.getOrDefault(k, 0L) + c)
      // the null-count map is keyed by the key column alone, so a
      // mostly-null column under a high-cardinality key would otherwise
      // grow it past the driver budget with bins still tiny
      if (nulls.size > maxBins) throw new BinsExceeded(maxBins)
    }
  }

  /** One row per key: (key, n, <one rounded double column per prob>).
    * Output rows are sorted by key (the driver compare sorts anyway; this
    * keeps the plan deterministic for snapshot diffing).
    *
    * @param roundScale decimal places for `round(q, roundScale)` parity with
    *                   the declarative/SQL form; negative disables rounding.
    */
  def byKeyHistogram(df: DataFrame, keyCol: String, valCol: String,
      probs: Seq[Double], outNames: Seq[String], roundScale: Int = 4,
      maxBins: Int = 4000000): DataFrame = {
    require(probs.nonEmpty && probs.size == outNames.size,
      "probs and outNames must align")
    require(probs.forall(p => p >= 0.0 && p <= 1.0), "probs must be in [0,1]")
    val spark = df.sparkSession
    val src = df.select(col(keyCol).cast("string").as("k"),
      col(valCol).cast("long").as("v"))
    val hist: Hist =
      try {
        src.rdd.aggregate(new Hist)(
          (m, r) => {
            if (r.isNullAt(1)) m.addNull(r.getString(0), 1L, maxBins)
            else m.addValue(r.getString(0), r.getLong(1), 1L, maxBins)
            m
          },
          (a, b) => {
            b.bins.forEach((k, c) => a.addValue(k._1, k._2, c, maxBins))
            b.nulls.forEach((k, c) => a.addNull(k, c, maxBins))
            a
          })
      } catch {
        // Spark wraps task failures; any BinsExceeded in the cause chain
        // means the integer domain was too wide for a driver histogram —
        // take the shuffle path instead of retrying a doomed job.
        case t: Throwable if causeChain(t).exists(_.isInstanceOf[BinsExceeded]) =>
          // schema/order parity with the histogram path: key as string,
          // rows sorted — a caller must not see the contract flip with
          // data volume
          return declarative(
            df.withColumn(keyCol, col(keyCol).cast("string")),
            keyCol, valCol, probs, outNames, roundScale)
            .orderBy(col(keyCol))
      }
    // Per key: sorted (value, count) runs → cumulative ranks → interpolate.
    val byKey = new scala.collection.mutable.HashMap[
      String, scala.collection.mutable.ArrayBuffer[(Long, Long)]]()
    hist.bins.forEach { (kv, c) =>
      byKey.getOrElseUpdate(kv._1,
        new scala.collection.mutable.ArrayBuffer[(Long, Long)]()) += ((kv._2, c))
      ()
    }
    hist.nulls.forEach { (k, _) =>
      if (!byKey.contains(k))
        byKey(k) = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      ()
    }
    // null keys are a real group (the declarative plan keeps them);
    // nulls sort first, then UTF-8 BINARY order — the ordering Spark's
    // orderBy uses, so the maxBins fallback's sorted output and this
    // path agree even on supplementary characters (where Java String
    // '<' — UTF-16 code units — disagrees with UTF-8 bytes)
    val rows = byKey.toSeq.sortWith { (a, b) =>
      if (a._1 == null) b._1 != null
      else if (b._1 == null) false
      else utf8Lt(a._1, b._1)
    }.map { case (k, binsBuf) =>
      val sorted = binsBuf.sortBy(_._1).toArray
      val nVals = sorted.iterator.map(_._2).sum
      val n = nVals + hist.nulls.getOrDefault(k, 0L)
      val qs: Seq[Any] = probs.map { p =>
        if (nVals == 0L) null
        else {
          val q = interpolate(sorted, nVals, p)
          if (roundScale >= 0)
            java.math.BigDecimal.valueOf(q)
              .setScale(roundScale, java.math.RoundingMode.HALF_UP).doubleValue()
          else q
        }
      }
      Row.fromSeq(k +: n +: qs)
    }
    val schema = StructType(
      StructField(keyCol, StringType) +: StructField("n", LongType) +:
        outNames.map(StructField(_, DoubleType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Exact rank interpolation on a sorted (value, count) histogram — the
    * `percentile`/`quantile_cont` definition: h = (n−1)p, linear between the
    * h-floor'th and next order statistics (0-based).
    */
  private def interpolate(sorted: Array[(Long, Long)], n: Long,
      p: Double): Double = {
    val h = (n - 1) * p
    val lo = math.floor(h).toLong
    // order statistic at 0-based rank r: first bin whose cumulative count
    // exceeds r
    def at(r: Long): Long = {
      var cum = 0L
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (cum > r) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }
    val lv = at(lo)
    if (h == lo) lv.toDouble
    else {
      // Spark's Percentile.getPercentile computes the interpolation as
      // (higher − pos)·v_lo + (pos − lower)·v_hi; reproducing that exact
      // float arithmetic keeps the histogram path bit-identical to the
      // declarative plan (the spec pins it).
      val hv = at(lo + 1)
      (lo + 1 - h) * lv + (h - lo) * hv
    }
  }

  /** Unsigned-lexicographic UTF-8 byte order — Spark's string orderBy. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  private def causeChain(t: Throwable): List[Throwable] = {
    val b = List.newBuilder[Throwable]
    var cur = t
    var depth = 0
    while (cur != null && depth < 16) { b += cur; cur = cur.getCause; depth += 1 }
    b.result()
  }

  /** The shuffle form — identical semantics, raw values buffered per group
    * on executors (never the driver). The fallback above `maxBins`, and the
    * reference the spec pins the histogram path against.
    */
  def declarative(df: DataFrame, keyCol: String, valCol: String,
      probs: Seq[Double], outNames: Seq[String],
      roundScale: Int = 4): DataFrame = {
    def q(p: Double): Column = {
      val raw = expr(s"percentile($valCol, $p)")
      if (roundScale >= 0) round(raw, roundScale) else raw
    }
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        probs.zip(outNames).map { case (p, nm) => q(p).as(nm) }: _*)
  }
}
