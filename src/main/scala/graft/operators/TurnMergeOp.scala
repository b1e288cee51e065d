package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The speaker-turn merge OPERATOR (a7; reference
  * chunking/chunkers/transcription_chunker.py:83-102) with the size gate
  * the fused kernel's own doc prescribes
  * ([[graft.functions.TurnMerge]]): the kernel form (one `collect_list`
  * shuffle + an in-memory per-group sort-and-fold) holds a whole group
  * as JVM objects, so it is for the bounded-per-group regime; the
  * declarative window form (lag → running-sum → re-aggregate) spills a
  * hot partition through WindowExec's
  * `ExternalAppendOnlyUnsafeRowArray`. This wrapper picks per call from
  * a MEASURED size, the [[GraphAnn.nnDescent]] `foldCarriedSims`
  * discipline: count-gated with a param override so a spec pins path
  * equality at unit scale.
  *
  * The gate is three tiers, cheapest first, each an upper bound on the
  * max group size: (1) `totalRowsHint` — the caller's table row count
  * (e.g. [[graft.Tables.parquetRowCount]]'s zero-job footer read; it
  * must be an UPPER bound on `events`' rows) — a table smaller than the
  * threshold cannot contain a group over it, so the common path adds NO
  * jobs; (2) `events.count()` (one metadata-only job on a parquet
  * scan); (3) only when the table is genuinely larger than the
  * threshold, the real per-group max (one partial-agg probe job). A
  * million-event hot key therefore lands on the spilling window path
  * instead of OOMing an executor, and everything smaller keeps the
  * fused plan.
  *
  * Both forms produce identical rows (spec-pinned, including the null
  * semantics [[graft.functions.TurnMerge]] documents): output
  * (`groupCol`, run_id, `keyCol`, n_events, sum_value), one row per
  * consecutive same-key run in (ts, id) order within each group. Only
  * `sum_value` is order-sensitive (float addition); consumers round it
  * (the a7 oracle rounds to 2 decimals).
  */
object TurnMergeOp {

  /** Above this max-group-size bound the kernel's one-group-in-memory
    * materialization is an OOM hazard and the spilling window form wins;
    * below it the fused plan is ~4× faster (BENCH a7 history). 2^20
    * events ≈ tens of MB of JVM structs per group — conservative for an
    * 8 GB executor, far above any per-user/per-speaker corpus shape.
    */
  val DefaultMaxKernelGroup: Long = 1L << 20

  def merge(events: DataFrame, groupCol: String, tsCol: String,
      idCol: String, keyCol: String, valueCol: String,
      maxKernelGroup: Long = DefaultMaxKernelGroup,
      totalRowsHint: Option[Long] = None,
      useKernel: Option[Boolean] = None): DataFrame = {
    val kernel = useKernel.getOrElse {
      totalRowsHint.exists(_ <= maxKernelGroup) || {
        val total = totalRowsHint.getOrElse(events.count())
        total <= maxKernelGroup || {
          val mg = events.groupBy(col(groupCol))
            .agg(count(lit(1)).as("c")).agg(max(col("c"))).head()
          !mg.isNullAt(0) && mg.getLong(0) <= maxKernelGroup
        }
      }
    }
    if (kernel) kernelForm(events, groupCol, tsCol, idCol, keyCol, valueCol)
    else windowForm(events, groupCol, tsCol, idCol, keyCol, valueCol)
  }

  /** The fused form: one shuffle, one Generate, no WindowExec. */
  def kernelForm(events: DataFrame, groupCol: String, tsCol: String,
      idCol: String, keyCol: String, valueCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events
      .groupBy(col(groupCol))
      .agg(collect_list(struct(col(tsCol).as("ts"), col(idCol).as("event_id"),
        col(keyCol).as("key"), col(valueCol).as("value"))).as("evs"))
      .select(col(groupCol), graft.functions.GraftFunctions.turn_merge(col("evs"))
        .as(Seq("run_id", keyCol, "n_events", "sum_value")))
  }

  /** The declarative spec: lag → running-sum → re-aggregate. WindowExec
    * spills a hot partition to disk, so this is the safe form for the
    * unbounded-per-group regime — and the semantics the kernel must
    * reproduce (the a7 oracle is this chain in SQL).
    */
  def windowForm(events: DataFrame, groupCol: String, tsCol: String,
      idCol: String, keyCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__chg",
        when(lag(col(keyCol), 1).over(w) <=> col(keyCol), 0L).otherwise(1L))
      .withColumn("run_id", sum(col("__chg")).over(cum))
      .groupBy(col(groupCol), col("run_id"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col(groupCol), col("run_id"), col(keyCol),
        col("n_events"), col("sum_value"))
  }
}
