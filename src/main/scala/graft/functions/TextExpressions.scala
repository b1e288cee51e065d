package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
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
