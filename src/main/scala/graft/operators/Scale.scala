package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §4 "Bounded concurrency / skew";
  * builder brief: "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join split handles most runtime skew; these helpers cover the
  * two patterns AQE cannot fix by itself:
  *
  *  - a single hot GROUP BY key whose partial aggregate still funnels into
  *    one reducer → two-phase salted aggregation;
  *  - a hot join key against a dimension too large to broadcast → replicate
  *    the dimension per salt so the hot key's rows spread over N reducers.
  *
  * Salts are deterministic (hash-derived), so results stay reproducible
  * run-to-run — same property as the stable chunk keys (X3).
  */
object Scale {

  /** Deterministic salt in [0, nSalts) derived from arbitrary columns. */
  def saltOf(nSalts: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(nSalts))

  /** Two-phase aggregation for skewed group keys: aggregate on
    * (key, salt) first — spreading a hot key over nSalts reducers — then
    * combine the partials per key. `partial` must be an algebraic
    * (re-aggregatable) function set; the caller passes both phases.
    *
    * Example: sum/count →
    * {{{
    * saltedAggregate(df, col("k"), saltOf(16, col("id")),
    *   Seq(sum("v").as("s"), count(lit(1)).as("n")),
    *   Seq(sum("s").as("s"), sum("n").as("n")))
    * }}}
    */
  def saltedAggregate(df: DataFrame, key: Column, salt: Column,
      partial: Seq[Column], combine: Seq[Column]): DataFrame =
    df.withColumn("_salt", salt)
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("_key"))
      .agg(combine.head, combine.tail: _*)

  /** Skew-proof equi-join of a fact table against a non-broadcastable
    * dimension: facts get a deterministic salt, the dimension is replicated
    * once per salt value, and the join key becomes (key, salt) — a hot key's
    * rows land on nSalts reducers instead of one.
    *
    * Row-multiplication is on the dimension side only (nSalts ×), which is
    * the side chosen precisely because it is the smaller one.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      nSalts: Int, saltSource: Column): DataFrame = {
    val salted = facts.withColumn("_salt", saltOf(nSalts, saltSource))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Semi-join reduction via a broadcast Bloom filter: when the probe side
    * is huge and the filter side's key set is selective but too big to
    * broadcast as a hash join, pre-filter the probe side with a Bloom
    * filter BEFORE its shuffle, then run the exact semi-join over the
    * survivors. False positives pass the Bloom stage and die in the exact
    * join, so the RESULT is exact — the filter only shrinks the shuffle.
    * This is the manual form of Spark's runtime bloom-filter injection
    * (`spark.sql.optimizer.runtime.bloomFilter.*`), exposed for when the
    * filter side is a computed dataset the optimizer can't see through.
    *
    * Key must be integral (long-compatible); `expectedKeys`/`fpp` size the
    * filter (bits ≈ -n·ln(fpp)/ln²2 — 1M keys at 1% ≈ 1.2 MB broadcast).
    */
  def bloomSemiJoin(probe: DataFrame, filterSide: DataFrame, key: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    // stat.bloomFilter NPEs on an empty input (null sketch buffer); the
    // isEmpty probe is a limit-1 job, not a full scan
    if (filterSide.isEmpty) return probe.limit(0)
    val bf = filterSide.stat.bloomFilter(key, expectedKeys, fpp)
    val bfB = probe.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) =>
      k != null && bfB.value.mightContainLong(k.longValue()))
    probe.filter(might(col(key).cast("long")))
      .join(filterSide.select(col(key)).distinct(), Seq(key), "left_semi")
  }

  /** ANTI-join with a broadcast Bloom short-circuit (string keys): rows the
    * Bloom filter rules out are DEFINITELY novel and bypass the join
    * entirely — no shuffle, no state — while "maybe present" rows (true
    * hits + fpp false positives) go through the exact left-anti join.
    * Result is exact; at a 1 % fpp the shuffled slice is the true-duplicate
    * volume + 1 % of the novel volume, which is what makes dedup-at-ingest
    * against a corpus-sized index affordable: the common case (novel row)
    * costs one broadcast-filter probe. The probe side is read twice (the
    * two filter branches are separate scans) — callers with an expensive
    * upstream should cache/checkpoint it first.
    */
  def bloomAntiJoin(probe: DataFrame, filterSide: DataFrame, key: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    // empty index → everything is novel (and stat.bloomFilter would NPE)
    if (filterSide.isEmpty) return probe
    val bf = filterSide.stat.bloomFilter(key, expectedKeys, fpp)
    val bfB = probe.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: String) => k != null && bfB.value.mightContainString(k))
    val definitelyNovel = probe.filter(!might(col(key)))
    val suspects = probe.filter(might(col(key)))
      .join(filterSide.select(col(key)).distinct(), Seq(key), "left_anti")
    definitelyNovel.unionByName(suspects)
  }
}
