package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Main-content extraction as a native codegen'd expression — the
  * [[UrlExpressions]] discipline: the kernel lives in
  * [[graft.operators.MainContent]] as plain statics, `doGenCode` emits
  * one static call, and the extraction rides whole-stage codegen instead
  * of paying UDF ser/de per page. */
object MainContentExpression {

  import org.apache.spark.sql.GraftBridge

  def mainContent(html: Column): Column =
    GraftBridge.column(MainContentExpr(GraftBridge.expression(html)))
}

case class MainContentExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_main_content"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    graft.operators.MainContent.extractUTF8(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.operators.MainContent.extractUTF8($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): MainContentExpr =
    copy(child = newChild)
}
