package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `turn_merge(array<struct<ts, event_id, key, value>>)` — the fused
  * speaker-turn merge kernel (a7; reference
  * chunking/chunkers/transcription_chunker.py:83-102): one generator call
  * per group sorts its rows by (ts, event_id) and folds consecutive
  * same-key runs into (run_id, key, n_events, sum_value) rows.
  *
  * This replaces the declarative lag → running-sum → groupBy chain, which
  * Spark plans as exchange + sort + row-at-a-time WindowExec (two window
  * functions) + a SECOND exchange for the (user, run_id, key) aggregate —
  * the d11 `graft_para_windows` fusion applied to a window-then-aggregate
  * shape: after one partial-agg-free `collect_list` shuffle on the group
  * key, the whole chain is a tight in-memory loop, and the fold order is
  * exactly the window's (ts, event_id) order so results are identical.
  *
  * MEMORY, honestly: WindowExec's unbounded-frame buffer is an
  * `ExternalAppendOnlyUnsafeRowArray` that SPILLS a hot partition to
  * disk; `collect_list` + this kernel hold one group's events as JVM
  * objects and do not. The fused form is therefore for the
  * bounded-per-group regime (events per user/speaker — the a7 shape);
  * a corpus with million-event hot keys should keep the declarative
  * window form, which stays available as the oracle's spec.
  *
  * Null semantics match the declarative form exactly (spec-pinned):
  * key comparison is null-safe (`lag(...) <=> key`) so consecutive null
  * keys continue one run; a group whose FIRST key is null starts at
  * run_id 0 (the lag seed is null, so `null <=> null` makes the first
  * chg 0) while a non-null first key starts at 1; a run whose every
  * value is null sums to NULL, not 0.0; null ts/event_id sort NULLS
  * FIRST (Spark's ascending default — before a pre-1970 negative
  * timestamp, not as 0). Null ARRAY ELEMENTS are skipped (no
  * declarative analog — rows cannot be null).
  */
case class TurnMerge(children: Seq[Expression])
    extends Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length != 1)
      TypeCheckResult.TypeCheckFailure(
        s"turn_merge expects 1 argument (array of event structs); got ${children.length}")
    else children.head.dataType match {
      case ArrayType(s: StructType, _) if s.length == 4 &&
          (s(0).dataType == TimestampType || s(0).dataType == LongType) &&
          s(1).dataType == LongType && s(2).dataType == StringType &&
          s(3).dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "turn_merge expects array<struct<ts: timestamp|long, event_id: long, " +
          s"key: string, value: double>>, got ${other.simpleString}")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("run_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = true),
    StructField("n_events", LongType, nullable = false),
    // null when every value in the run is null — sum()'s semantics
    StructField("sum_value", DoubleType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = children.head.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() == 0) return Iterator.empty
    val total = arr.numElements()
    // materialize (ts, id, key, value); key is copied out of the unsafe
    // buffer (UTF8String from an UnsafeArrayData aliases backing bytes);
    // null array ELEMENTS are skipped (rows cannot be null in the
    // declarative form, so there is nothing to reproduce for them)
    val ts = new Array[Long](total)
    val tsNull = new Array[Boolean](total)
    val ids = new Array[Long](total)
    val idNull = new Array[Boolean](total)
    val keys = new Array[UTF8String](total)
    val vals = new Array[Double](total)
    val valNull = new Array[Boolean](total)
    var n = 0
    var e = 0
    while (e < total) {
      if (!arr.isNullAt(e)) {
        val r = arr.getStruct(e, 4)
        tsNull(n) = r.isNullAt(0)
        ts(n) = if (tsNull(n)) 0L else r.getLong(0)
        idNull(n) = r.isNullAt(1)
        ids(n) = if (idNull(n)) 0L else r.getLong(1)
        keys(n) = if (r.isNullAt(2)) null else r.getUTF8String(2).clone()
        valNull(n) = r.isNullAt(3)
        vals(n) = if (valNull(n)) 0.0 else r.getDouble(3)
        n += 1
      }
      e += 1
    }
    if (n == 0) return Iterator.empty
    val order = new Array[Integer](n)
    var i = 0
    while (i < n) { order(i) = i; i += 1 }
    // the window's ORDER BY (ts, event_id) — ascending with NULLS FIRST
    // on both keys, exactly Spark's default (a null ts must sort before
    // a pre-1970 negative timestamp, not as 0)
    java.util.Arrays.sort(order, (a: Integer, b: Integer) => {
      val tn = java.lang.Boolean.compare(tsNull(b), tsNull(a)) // nulls first
      if (tn != 0) tn
      else {
        val c = java.lang.Long.compare(ts(a), ts(b))
        if (c != 0) c
        else {
          val in = java.lang.Boolean.compare(idNull(b), idNull(a))
          if (in != 0) in else java.lang.Long.compare(ids(a), ids(b))
        }
      }
    })
    // fold consecutive same-key rows (null-safe) into runs
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var runId = 0L
    var runKey: UTF8String = null
    var runN = 0L
    var runSum = 0.0
    var runNonNull = 0L // sum over all-null values is NULL, like sum()
    var started = false
    def emit(): Unit =
      out += InternalRow(runId, runKey, runN,
        if (runNonNull == 0) null else runSum)
    i = 0
    while (i < n) {
      val j = order(i)
      val k = keys(j)
      val same = started &&
        (if (runKey == null) k == null else k != null && runKey.equals(k))
      if (same) {
        runN += 1
        if (!valNull(j)) { runSum += vals(j); runNonNull += 1 }
      } else {
        if (started) emit()
        // the lag seed is null, so a null FIRST key compares equal to it
        // (null <=> null) and the declarative running sum starts at 0;
        // any later run change adds 1 — reproduced exactly
        runId += (if (!started && k == null) 0 else 1)
        runKey = k; runN = 1; started = true
        runNonNull = if (valNull(j)) 0 else 1
        runSum = if (valNull(j)) 0.0 else vals(j)
      }
      i += 1
    }
    if (started) emit()
    out.iterator
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
