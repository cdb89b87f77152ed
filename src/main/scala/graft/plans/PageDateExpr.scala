package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Publication-date ladder as a native codegen'd expression — kernel in
  * [[graft.operators.PageDate]], one static call in `doGenCode`. The
  * expression is null-safe on its inputs (the Column wrapper coalesces
  * a missing url/html to "" so one absent side cannot null the other's
  * rungs); "no rung fired" surfaces as a null struct. */
case class PageDateExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "graft_page_date"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string url, string html), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("date_src", StringType, nullable = false),
    StructField("pub_date", StringType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(url: Any, html: Any): Any =
    graft.operators.PageDate.extractRow(
      url.asInstanceOf[UTF8String], html.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, h) => {
      s"""
         |${ev.value} = graft.operators.PageDate.extractRow($u, $h);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PageDateExpr =
    copy(left = newLeft, right = newRight)
}
