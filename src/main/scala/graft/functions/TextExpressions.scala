package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions over text columns.
  *
  * `token_count` runs on EVERY chunk of every document (the n_tokens
  * column in [[graft.pipeline.Chunkers.chunkDocuments]] and the X5
  * queries), so unlike the non-hot-path UDF family it earns codegen: the
  * generated code calls straight into the matcher loop with no UDF
  * wrapper, no Option boxing, and the enclosing projection stays inside
  * WholeStageCodegen.
  */
object TextKernels {
  /** Count without materializing tokens. Null never reaches here —
    * [[TokenCount]] has SQL-standard null-in/null-out semantics (NOTE: the
    * pre-promotion UDF returned 0 for null text; no gate table has null
    * text, but new callers should expect the standard behavior).
    */
  def tokenCount(s: UTF8String): Int =
    graft.core.RegexTokenizer.count(s.toString)
}

case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sketch kernels — the per-row inner loops of the near-dup families
  * (d2/d3 run one of these over EVERY document). Same promotion rationale
  * as token_count: the generated projection calls the static kernel
  * directly, no UDF encoder boundary, and the enclosing stage (signature →
  * band explode) stays inside WholeStageCodegen. Null text follows SQL
  * null-in/null-out (the pre-promotion UDFs would have NPE'd).
  */
object HashKernels {
  def minhash(s: UTF8String): ArrayData =
    new GenericArrayData(Hashing.minhashSignature(s.toString))
  def simhash(s: UTF8String): Long = Hashing.simhash64(s.toString)

  /** Sorted DISTINCT word-shingle hashes of one document — the set the
    * exact-Jaccard verify stage compares. Computed once per document (one
    * scan) instead of once per candidate pair: a doc in k pairs was
    * previously re-tokenized k times inside the pair-level UDF.
    */
  def shingleSet(s: UTF8String): ArrayData = {
    val sh = Hashing.shingles(s.toString)
    java.util.Arrays.sort(sh)
    var n = 0
    var i = 0
    while (i < sh.length) { // dedupe in place over the sorted run
      if (n == 0 || sh(i) != sh(n - 1)) { sh(n) = sh(i); n += 1 }
      i += 1
    }
    new GenericArrayData(if (n == sh.length) sh else java.util.Arrays.copyOf(sh, n))
  }

  /** Exact Jaccard of two SORTED distinct long arrays via a single merge
    * loop — pure set arithmetic, no string work. Both-empty → 1.0 (the
    * [[Hashing.ngramJaccard]] rule, so the rework is value-identical).
    */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

case class MinHashSignature(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullSafeEval(input: Any): Any =
    HashKernels.minhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShingleHashSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"
  override def nullSafeEval(input: Any): Any =
    HashKernels.shingleSet(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.shingleSet($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SortedSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_set_jaccard"
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.sortedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashKernels.sortedJaccard($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
