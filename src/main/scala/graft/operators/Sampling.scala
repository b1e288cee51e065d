package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus sampling and packing operators (builder brief: the
  * operations a large-scale training-data pipeline needs beyond the
  * reference's own surface).
  *
  * Everything here is deterministic: sampling decisions come from a
  * portable multiplicative hash over a stable id, never from `rand()`, so
  * a re-run (or a DuckDB oracle) reproduces the exact same sample. That is
  * the property that makes corpus construction auditable — the "which rows
  * made it into the training set" question must have one answer.
  *
  * Scale notes:
  *  - [[packSequences]] windows PER STRATUM (one shuffle, strata run in
  *    parallel); it never globally sorts the corpus.
  *  - [[balancedSample]] broadcasts only the per-stratum count table
  *    (|strata| rows) — the corpus side is a scan + filter, no shuffle.
  *  - [[reservoirPerKey]] is a rank-limit window: Spark ≥3.5 plans it with
  *    WindowGroupLimit, pushing the k-limit below the shuffle so each map
  *    task emits at most k rows per key instead of its full partition.
  *  - [[temperatureWeights]] aggregates to |strata| rows before any
  *    driver-visible work; the normalizing constant is a broadcast scalar.
  */
object Sampling {

  /** Knuth multiplicative hash, expressible in pure BIGINT arithmetic so
    * any engine (Spark, DuckDB, a Python checker) computes the identical
    * value: `(id * 2654435761) mod 2^32`. Inputs are non-negative ids well
    * below 2^31, so the product stays inside signed-64 range.
    */
  def portableHash(id: Column): Column =
    (id * lit(2654435761L)) % lit(4294967296L)

  /** Sequence packing, concat-then-chop form: lay documents end to end in
    * a per-stratum token stream (ordered by `orderCol`) and assign each
    * document to the fixed-size context window containing its START
    * offset. This is the standard LM pretraining packing (documents joined
    * with an EOS, then split into max-length sequences); the greedy
    * "reset the bin when it overflows" variant is stateful-recursive and
    * deliberately not this operator.
    *
    * Adds `start_offset` (tokens before this doc in its stratum) and
    * `seq_id` (= floor(start_offset / budget)).
    */
  def packSequences(df: DataFrame, stratumCol: String, orderCol: String,
      tokensCol: String, budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val before = Window.partitionBy(stratumCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_offset",
        coalesce(sum(col(tokensCol)).over(before), lit(0L)))
      .withColumn("seq_id", floor(col("start_offset") / budgetTokens))
  }

  /** Balanced stratified sample: downsample every stratum to approximately
    * the size of the SMALLEST stratum, deterministically. A row survives
    * iff `hash(id) mod n_stratum < n_min` — an integer-exact keep rule (no
    * float rate at the decision boundary), expected survivors ≈ n_min per
    * stratum. Only the per-stratum count table is broadcast.
    */
  def balancedSample(df: DataFrame, stratumCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n_stratum"))
    val nMin = counts.agg(min(col("n_stratum")).as("n_min"))
    df.join(broadcast(counts), Seq(stratumCol))
      .crossJoin(broadcast(nMin))
      .filter(portableHash(col(idCol)) % col("n_stratum") < col("n_min"))
      .drop("n_stratum", "n_min")
  }

  /** Deterministic "reservoir" of k rows per key: bottom-k by the portable
    * hash (ties broken by id). Equivalent to uniform-without-replacement
    * sampling under the hash's mixing, but replayable. Planned as a
    * rank-limit window (WindowGroupLimit: ≤k rows per key cross the
    * shuffle), not a full per-key sort.
    */
  def reservoirPerKey(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(keyCol)
      .orderBy(portableHash(col(idCol)).asc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Sequence packing, document-intact greedy form: walk each stratum in
    * `orderCol` order and start a new bin whenever adding the next document
    * would overflow the token budget (a document larger than the budget
    * gets a bin of its own). Unlike [[packSequences]] this never splits a
    * document across sequences — the trade is per-bin slack. The recurrence
    * (bin state depends on every earlier row) is not window-expressible, so
    * it runs as a per-partition linear scan after one hash partition on the
    * stratum: strata pack in parallel, rows stream through constant state.
    *
    * Scale note: a stratum is the sequential unit. If one stratum dominates
    * the corpus, pre-shard it (make the stratum `(lang, shard)`) — packing
    * quality degrades only at the ≤ nShards bin boundaries.
    *
    * Adds `bin_id` (0-based per stratum). `tokensCol` must be numeric.
    */
  def packGreedyIntact(df: DataFrame, stratumCol: String, orderCol: String,
      tokensCol: String, budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(df.schema.fields :+
      StructField("bin_id", LongType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val sIdx = df.schema.fieldIndex(stratumCol)
    val tIdx = df.schema.fieldIndex(tokensCol)
    df.repartition(col(stratumCol))
      .sortWithinPartitions(col(stratumCol), col(orderCol))
      .mapPartitions { rows =>
        // several strata can hash into one partition; the sort keeps each
        // contiguous, so a stratum change resets the bin state
        var curStratum: Any = null
        var started = false
        var bin = 0L
        var binTokens = 0L
        rows.map { r =>
          val st = r.get(sIdx)
          val n = r.getAs[Number](tIdx).longValue()
          if (!started || st != curStratum) {
            curStratum = st; started = true; bin = 0L; binTokens = n
          } else if (binTokens + n > budgetTokens) {
            bin += 1L; binTokens = n
          } else binTokens += n
          Row.fromSeq(r.toSeq :+ bin)
        }
      }(enc)
  }

  /** Temperature-based resampling weights: stratum d gets
    * `w_d = n_d^alpha / sum_e(n_e^alpha)`. alpha=1 reproduces natural
    * proportions, alpha=0 is uniform; alpha in (0,1) upweights small
    * strata (the multilingual-pretraining standard). Returns one row per
    * stratum: (stratum, n, weight).
    */
  def temperatureWeights(df: DataFrame, stratumCol: String, alpha: Double): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n"))
    val z = counts.agg(sum(pow(col("n"), alpha)).as("z"))
    counts.crossJoin(broadcast(z))
      .withColumn("weight", pow(col("n"), alpha) / col("z"))
      .drop("z")
  }

  /** Deterministic epoch reshuffle for training-order assembly: each epoch
    * permutes the corpus differently, but reproducibly — order comes from
    * an epoch-salted multiplicative hash, never from `rand()`, so any
    * worker (or a DuckDB audit) can answer "which example was row 4 071 of
    * shard 17 in epoch 2". Rows are assigned to `nShards` shards and
    * ranked within their shard; training readers consume shards
    * independently.
    *
    * Scale shape: one shuffle on (epoch, shard) and a sort WITHIN each
    * shard — there is deliberately no global row_number (a total order
    * funnels the corpus through one reducer; per-shard order is what
    * training jobs actually need, and nShards scales with the corpus).
    */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int,
      nShards: Int): DataFrame = {
    require(epochs > 0 && nShards > 0, "epochs and nShards must be positive")
    val epoch = explode(sequence(lit(0), lit(epochs - 1))).as("epoch")
    // the epoch must enter the hash NON-linearly: any affine mix
    // ((id + epoch*c)*A mod 2^32) only shifts the hash by a per-epoch
    // constant, which with power-of-two shard counts relabels shards and
    // rotates within-shard order — the same permutation every epoch. A
    // cryptographic digest of "id:epoch" has no such structure, and the
    // md5-prefix form is reproducible by any engine (the oracle uses it).
    val withEpoch = df.select(col("*"), epoch)
      .withColumn("_h",
        conv(substring(md5(concat_ws(":",
          col(idCol).cast("string"), col("epoch").cast("string"))), 1, 8),
          16, 10).cast("long"))
      .withColumn("shard", (col("_h") % nShards).cast("int"))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("_h"), col(idCol))
    withEpoch.withColumn("pos", row_number().over(w)).drop("_h")
  }

  /** One epoch of [[epochShuffle]] without materializing the others: the
    * identical md5("id:epoch") hash with the epoch as a literal, so the
    * corpus is projected and window-sorted exactly ONCE regardless of the
    * epoch index — [[graft.pipeline.ShardExport]] exports epoch 50 at the
    * cost of epoch 0, where filtering the exploded form would hash and
    * shuffle 51 copies. Same (shard, pos) assignment as the exploded form
    * for that epoch (the sp7/sp10 oracle convention).
    */
  def singleEpochShuffle(df: DataFrame, idCol: String, epoch: Int,
      nShards: Int): DataFrame = {
    require(epoch >= 0 && nShards > 0, "epoch must be >= 0, nShards positive")
    val withHash = df
      .withColumn("_h",
        conv(substring(md5(concat_ws(":",
          col(idCol).cast("string"), lit(epoch).cast("string"))), 1, 8),
          16, 10).cast("long"))
      .withColumn("shard", (col("_h") % nShards).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    withHash.withColumn("pos", row_number().over(w)).drop("_h")
  }

  /** Leakage-safe train/val/test split: the decision hashes the GROUP key
    * (source, domain, url-host — whatever shares contamination), never the
    * row, so every document of a group lands in the same split and
    * near-duplicates within a source can't straddle the train/eval
    * boundary. The hash is the first 8 hex digits of md5(group) — a
    * portable 32-bit value any engine reproduces — mapped to per-mille
    * bands: [0, test) → test, [test, test+val) → val, rest → train.
    * Pure projection: no shuffle, no state.
    */
  def groupedSplit(df: DataFrame, groupCol: String,
      valPerMille: Int = 100, testPerMille: Int = 100): DataFrame = {
    require(valPerMille >= 0 && testPerMille >= 0 &&
      valPerMille + testPerMille <= 1000, "per-mille bands must fit in 1000")
    val h = conv(substring(md5(col(groupCol)), 1, 8), 16, 10)
      .cast("long") % 1000
    df.withColumn("split",
      when(h < testPerMille, "test")
        .when(h < testPerMille + valPerMille, "val")
        .otherwise("train"))
  }

  /** Token-budget-capped selection: walk each stratum in `orderCol` order
    * (priority — quality rank, recency, a deterministic hash) and keep
    * rows while the running `tokensCol` sum stays within `budget`. The
    * data-constrained-training primitive: "give me the best 50 B tokens
    * per language". One window shuffle per stratum, rank-limit-friendly,
    * exact and reproducible (no fractional sampling at the cut).
    */
  def takeTokenBudget(df: DataFrame, stratumCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col(orderCol)).rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("_run", sum(col(tokensCol)).over(w))
      .filter(col("_run") <= budget)
      .withColumnRenamed("_run", "tokens_through")
  }

  /** Domain-mixture sampling: downsample each domain so the kept corpus
    * approaches target mixture `shares` (relative integer weights per
    * domain; unlisted domains get weight 0) under a global budget of
    * `budgetNum/budgetDen` of the corpus's total `unitCol` (tokens, bytes,
    * docs — the caller's currency). Per-domain keep probability is the
    * integer threshold
    *   thr_d = min(10^6, 10^6 · budget·share_d/Σshares / units_d)
    * and a row survives iff `portableHash(id) mod 10^6 < thr_d` — pure
    * BIGINT arithmetic end to end, so the exact kept row set is
    * reproducible anywhere. (A domain scarcer than its target share keeps
    * everything — rate capped at 1 — and the realized mixture degrades
    * gracefully, which is the standard behavior: mixing can only
    * downsample, not mint data.)
    *
    * Scale shape: the mixture plan is a |domains|-row aggregate BROADCAST
    * back onto the corpus; the corpus side is scan + filter — no shuffle,
    * no driver collect.
    */
  def domainMixSample(df: DataFrame, domainCol: String, idCol: String,
      unitCol: String, shares: Map[String, Int],
      budgetNum: Int, budgetDen: Int): DataFrame = {
    val M = 1000000L
    val shareOf = shares.foldLeft(lit(0L)) { case (acc, (d, w)) =>
      when(col(domainCol) === d, lit(w.toLong)).otherwise(acc)
    }
    val sumShares = shares.values.map(_.toLong).sum max 1L
    val perDomain = df.groupBy(col(domainCol))
      .agg(sum(col(unitCol)).cast("long").as("units_d"))
      .withColumn("share_d", shareOf)
    val total = perDomain.agg(sum(col("units_d")).as("units_total"))
    // double-precision rate, integer threshold: IEEE ops in a fixed order,
    // so any engine evaluating the same expression gets the same thr (and
    // the product never outgrows int64 the way M·budget_d·units would)
    val plan = perDomain.crossJoin(broadcast(total))
      .withColumn("budget_d",
        col("units_total") * (lit(budgetNum.toDouble) / budgetDen) *
          col("share_d") / sumShares)
      .withColumn("thr", least(lit(M),
        floor(lit(M) * col("budget_d") / greatest(col("units_d"), lit(1L)))))
      .select(col(domainCol), col("thr"))
    df.join(broadcast(plan), Seq(domainCol))
      .filter(portableHash(col(idCol)) % M < col("thr"))
      .drop("thr")
  }

  /** Materialized weighted UPSAMPLING — the "N epochs of Wikipedia" mixing
    * primitive (LLaMA/Dolma-style data recipes quote per-source epoch
    * counts > 1, which downsampling alone cannot express): each row is
    * replicated `⌊w⌋` times plus one more iff its portable hash falls
    * under `frac(w)` — so expected copies = w exactly, the realized corpus
    * is deterministic (any engine reproduces the row multiset), and rows
    * with w < 1 degrade to plain Bernoulli downsampling. Emits the input
    * columns plus `rep` (1-based copy index, so downstream epoch shuffles
    * can salt replicas apart). Scan + explode — no shuffle, no state;
    * output size is Σw rows regardless of skew.
    */
  def upsampleByWeight(df: DataFrame, idCol: String, weight: Column): DataFrame = {
    val M = 1000000L
    val frac = ((weight * M).cast("long") % M + M) % M // frac(w) in ppm
    val copies = floor(weight).cast("long") +
      when(portableHash(col(idCol)) % M < frac, 1L).otherwise(0L)
    df.withColumn("_copies", copies)
      .filter(col("_copies") >= 1L)
      .withColumn("rep", explode(sequence(lit(1L), col("_copies"))))
      .drop("_copies")
  }
}
