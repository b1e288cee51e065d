package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row (key, t), attach the
  * right row with the same key and the largest right-time <= t.
  *
  * The naive plan — equi-join on key, filter rt <= t, max-per-left-row —
  * explodes to |left| x |right-per-key| intermediate rows. This
  * implementation is the scale-correct single-window merge: union both
  * sides tagged, sort each key partition once by (time, side), and carry
  * the last-seen right payload forward with `last(_, ignoreNulls)` over an
  * unbounded-preceding window. Cost is ONE shuffle on the key and one sort
  * per partition — no range explosion, no per-row scan, and skew follows
  * the key distribution exactly like any keyed window.
  *
  * Right rows sort BEFORE left rows at equal timestamps (side 0 < side 1),
  * giving the standard inclusive `t >= rt` as-of semantics (matches SQL
  * engines' ASOF JOIN). If several right rows share (key, time), the one
  * latest in `rightOrder` wins — pass a deterministic tiebreak column.
  * The payload travels as ONE struct, so the attached columns always come
  * from the SAME right row even when some payload values are null.
  */
object AsOfJoin {

  /** @param left       probe side; must contain `key` and `leftTime`
    * @param right      build side; must contain `key`, `rightTime`, `payload` cols
    * @param key        equi-join key column name (same name both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right columns carried to the output (as-of values);
    *                   null for left rows with no matching right row yet
    * @param rightOrder extra deterministic tiebreak for right rows sharing
    *                   (key, rightTime); later wins
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      rightOrder: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.contains(key) && payload.forall(right.columns.contains),
      s"payload must be right-side non-key columns; got $payload")
    require(payload.forall(p => !leftCols.contains(p)),
      s"payload collides with left columns: ${payload.filter(leftCols.contains)}")

    val payloadStruct = struct(payload.map(col): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p))))
    val tiebreak: Column = rightOrder.map(col).getOrElse(lit(0))

    val l = left
      .select((Seq(col(key), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast("long").as("__tb"), nullPayload.as("__payload")) ++
        leftCols.filterNot(_ == key).map(col)): _*)
    val r = right
      .select((Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        tiebreak.cast("long").as("__tb"), payloadStruct.as("__payload")) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__asof.$p").as(p)): _*)
  }
}
