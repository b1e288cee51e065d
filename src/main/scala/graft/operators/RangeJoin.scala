package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without a range-join operator: Spark would plan
  * `e.ts BETWEEN w.start AND w.end` as a broadcast-nested-loop or cartesian
  * product, both of which are O(|probes| x |intervals|) at scale. The
  * standard fix is temporal bucketing: quantize time into fixed buckets,
  * EXPLODE each interval over the buckets it covers, tag each probe with
  * its single bucket, equi-join on (keys..., bucket), and refine with the
  * exact predicate. One hash shuffle, no product surface.
  *
  * Cost model: an interval spanning S seconds lands in ceil(S/W)+1 buckets,
  * so the exploded side grows by that factor — pick `bucketSeconds` near
  * the typical interval length so the factor stays ~2 while probe buckets
  * stay selective. Each (probe, interval) match is produced exactly once
  * (the probe's own bucket), so no post-join dedup is needed.
  */
object RangeJoin {

  /** Join `probes` to every row of `intervals` whose `[startCol, endCol)`
    * window contains the probe's `tsCol`, with equality on `keys`.
    * Column sets must be disjoint apart from `keys`.
    */
  def bucketedIntervalJoin(probes: DataFrame, intervals: DataFrame,
      keys: Seq[String], tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val b = lit(bucketSeconds)
    // unix_timestamp truncates to whole seconds; with bucket boundaries on
    // the integer-second grid, truncation never moves an instant across a
    // bucket boundary, and the exact refine filter below uses the full
    // timestamps anyway. The end bucket uses floor(end/b) (not end-1) so a
    // sub-second tail can never drop the last covered bucket.
    val iv = intervals.withColumn("_bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / b),
        floor(unix_timestamp(col(endCol)) / b))))
    val pr = probes.withColumn("_bucket",
      floor(unix_timestamp(col(tsCol)) / b))
    pr.join(iv, keys :+ "_bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bucket")
  }
}
