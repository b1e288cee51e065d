package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
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
