package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}

/** WHATWG MIME sniffing as a native codegen'd expression over a binary
  * column — the [[UrlExpressions]] discipline: kernel in
  * [[graft.operators.MimeSniff]], one static call in `doGenCode`. */
object MimeSniffExpression {

  import org.apache.spark.sql.GraftBridge

  def mimeOf(bytes: Column): Column =
    GraftBridge.column(MimeSniffExpr(GraftBridge.expression(bytes)))
}

case class MimeSniffExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_mime_sniff"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    graft.operators.MimeSniff.sniffUTF8(input.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.operators.MimeSniff.sniffUTF8($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): MimeSniffExpr =
    copy(child = newChild)
}
