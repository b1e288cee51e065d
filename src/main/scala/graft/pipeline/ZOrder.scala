package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-column scan pruning — the
  * lakehouse maintenance op (Delta `OPTIMIZE ZORDER BY`, Iceberg
  * `rewrite_data_files(strategy => 'sort', sort_order => zorder(...))`)
  * that makes file-level min/max statistics selective on SEVERAL lookup
  * columns at once. Sorting by one column gives perfect pruning on it
  * and none on the others; interleaving the columns' bucket bits gives
  * every column ~(1/2^(bits_shared)) of the global span per file, so a
  * 100 TB table pruned by EITHER key skips most files.
  *
  * Scale shape: one cheap global min/max aggregate (2·k values to the
  * driver), then a MAP-ONLY projection computes each row's z-value with
  * codegen'd integer arithmetic (no UDF), and one shuffle on the
  * z-slot writes slot-contiguous files. Buckets are VALUE-range based
  * (integer-exact, engine-reproducible) rather than rank-based — rank
  * bucketing needs a global sort, and the quantile variant trades
  * determinism for skew resistance; callers with pathological value
  * skew should pre-transform the column (log, hash-prefix) instead.
  */
object ZOrder {

  /** Interleave the low `bits` of `buckets` round-robin: bit j of
    * buckets(c) lands at position j·k + (k−1−c), so column 0 owns the
    * highest bit of each group — all codegen'd shift/mask arithmetic.
    */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits >= 1 && bits * buckets.length <= 62)
    val k = buckets.length
    val terms = for (j <- 0 until bits; c <- 0 until k) yield
      shiftleft(shiftright(buckets(c), j).bitwiseAND(lit(1L)),
        j * k + (k - 1 - c))
    terms.reduce(_ + _)
  }

  /** Append `zval` for the given integral columns: per-column value-range
    * buckets of 2^bits, bit-interleaved. The min/max aggregate is the
    * only non-map work. Constant columns (min == max) bucket to 0.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    require(cols.nonEmpty, "need at least one z-order column")
    val aggCols = cols.flatMap(c => Seq(min(col(c)).cast("long").as(s"mn_$c"),
      max(col(c)).cast("long").as(s"mx_$c")))
    val stats = df.agg(aggCols.head, aggCols.tail: _*).head()
    // empty input (or all-null key columns): no range exists — emit a
    // constant z so the schema holds and zero rows flow through
    if (stats.isNullAt(0)) return df.withColumn("zval", lit(0L))
    withZValue(df, cols, bits,
      cols.zipWithIndex.map { case (c, i) =>
        c -> (stats.getLong(2 * i), stats.getLong(2 * i + 1)) }.toMap)
  }

  /** [[withZValue]] with the min/max ranges supplied — the lakehouse
    * form: a table format keeps column min/max in its metadata
    * ([[graft.Tables.parquetLongStats]] reads them from parquet footers
    * with zero Spark jobs), so the layout pass is PURELY map-side — no
    * driver-blocking stats aggregate before the projection. Output is
    * bit-identical to the self-computed overload when the ranges are the
    * table's true min/max (footer stats are exact).
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
      ranges: Map[String, (Long, Long)]): DataFrame = {
    require(cols.nonEmpty, "need at least one z-order column")
    val buckets = cols.map { c =>
      val (mn, mx) = ranges.getOrElse(c,
        throw new IllegalArgumentException(s"no range supplied for $c"))
      // integer-exact: (v − min)·2^bits div range — reproducible by any
      // engine with 64-bit integer arithmetic (the k9 oracle mirrors it).
      // The VALUE clamps into [mn, mx] BEFORE the multiply: a value far
      // outside the supplied range (stale catalog stats, a range narrower
      // than the data) must land in the edge bucket — the lakehouse
      // arrival semantics — and clamping after the multiply would let
      // (v − mn)·2^bits overflow Long, wrap negative, and clamp to the
      // WRONG edge. Clamp-first bounds the product by range·2^bits —
      // which itself fits a Long only while range ≤ 2^(63−bits), so the
      // branch is decided HERE, at plan time, where mn/mx are known:
      // beyond that (nanosecond-epoch spans, near-full-Long ranges,
      // including mx−mn itself overflowing) a double-precision bucket
      // with an output clamp takes over — monotone and bounded, at most
      // one boundary row per 2^52 values off the integer form, which a
      // LAYOUT bucketing tolerates (the exact form remains the oracle's
      // contract for every range it can represent).
      val rangeBig = BigInt(mx) - BigInt(mn) + 1
      if (rangeBig <= (BigInt(Long.MaxValue) >> bits))
        expr(s"((greatest(${mn}L, least(${mx}L, cast(`$c` as bigint)))" +
          s" - ${mn}L) * ${1L << bits}L) div ${rangeBig.toLong}L")
      else {
        val stepD = (rangeBig.toDouble / (1L << bits).toDouble)
        expr(s"greatest(0L, least(${(1L << bits) - 1}L, " +
          s"cast(floor((cast(`$c` as double) - ${mn}.0D) / ${stepD}D)" +
          s" as bigint)))")
      }
    }
    df.withColumn("zval", interleave(buckets, bits))
  }

  /** Rewrite `df` as `nSlots` slot-contiguous parquet directories under
    * `dir` (slot = the top log2(nSlots) z-bits, a deterministic
    * range-contiguous split — no sampling, unlike repartitionByRange),
    * rows z-sorted within each slot. Returns the slotted frame.
    */
  def zOrderWrite(df: DataFrame, cols: Seq[String], bits: Int,
      nSlots: Int, dir: String,
      ranges: Option[Map[String, (Long, Long)]] = None): DataFrame = {
    require(nSlots >= 1 && Integer.bitCount(nSlots) == 1, "nSlots must be a power of two")
    val slotBits = 31 - Integer.numberOfLeadingZeros(nSlots)
    // ranges from table metadata (Tables.parquetLongStats) make the whole
    // rewrite map-side + one shuffle — no stats pre-aggregate
    val z = ranges.map(withZValue(df, cols, bits, _))
      .getOrElse(withZValue(df, cols, bits))
      .withColumn("_slot",
        shiftright(col("zval"), bits * cols.length - slotBits).cast("int"))
    z.repartition(nSlots, col("_slot"))
      .sortWithinPartitions(col("_slot"), col("zval"))
      .write.mode(SaveMode.Overwrite).partitionBy("_slot").parquet(dir)
    z
  }
}
