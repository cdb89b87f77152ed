package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}

/** Accent folding (NFD + strip combining marks) as a native expression:
  * the kernel lives in [[graft.operators.UnicodeFold]] and `doGenCode`
  * emits ONE static call, so normalization stays inside whole-stage
  * codegen (same discipline as [[LangIdExpr]]). Null in, null out; the
  * kernel's ASCII fast path returns the input buffer uncopied. */
case class FoldAccentsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_fold_accents"

  override def nullSafeEval(input: Any): Any =
    graft.operators.UnicodeFold.foldAccentsUTF8(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.UnicodeFold.foldAccentsUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): FoldAccentsExpr =
    copy(child = newChild)
}
