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
  * The per-group buffer equals WindowExec's own unbounded-frame buffer,
  * so the memory profile at 100 TB is the same — one group in memory per
  * task at a time.
  *
  * Key comparison is null-safe (`lag(...) <=> key` in the declarative
  * form): two consecutive null keys continue one run.
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
    StructField("sum_value", DoubleType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = children.head.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() == 0) return Iterator.empty
    val n = arr.numElements()
    // materialize (ts, id, key, value); key is copied out of the unsafe
    // buffer (UTF8String from an UnsafeArrayData aliases backing bytes)
    val ts = new Array[Long](n)
    val ids = new Array[Long](n)
    val keys = new Array[UTF8String](n)
    val vals = new Array[Double](n)
    val order = new Array[Integer](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 4)
      ts(i) = r.getLong(0)
      ids(i) = r.getLong(1)
      keys(i) = if (r.isNullAt(2)) null else r.getUTF8String(2).clone()
      vals(i) = if (r.isNullAt(3)) 0.0 else r.getDouble(3)
      order(i) = i
      i += 1
    }
    // the window's ORDER BY (ts, event_id)
    java.util.Arrays.sort(order, (a: Integer, b: Integer) => {
      val c = java.lang.Long.compare(ts(a), ts(b))
      if (c != 0) c else java.lang.Long.compare(ids(a), ids(b))
    })
    // fold consecutive same-key rows (null-safe) into runs
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var runId = 0L
    var runKey: UTF8String = null
    var runN = 0L
    var runSum = 0.0
    var started = false
    def emit(): Unit =
      out += InternalRow(runId, runKey, runN, runSum)
    i = 0
    while (i < n) {
      val j = order(i)
      val k = keys(j)
      val same = started &&
        (if (runKey == null) k == null else k != null && runKey.equals(k))
      if (same) { runN += 1; runSum += vals(j) }
      else {
        if (started) emit()
        runId += 1; runKey = k; runN = 1; runSum = vals(j); started = true
      }
      i += 1
    }
    if (started) emit()
    out.iterator
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
