package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML head-metadata extraction as native codegen'd expressions — the
  * [[UrlExpressions]] discipline: kernels in
  * [[graft.operators.HtmlMeta]], one static call per `doGenCode`. */
object HtmlMetaExpressions {

  import org.apache.spark.sql.GraftBridge

  def htmlTitle(html: Column): Column =
    GraftBridge.column(HtmlTitleExpr(GraftBridge.expression(html)))
  def htmlDescription(html: Column): Column =
    GraftBridge.column(HtmlDescriptionExpr(GraftBridge.expression(html)))
  def htmlCanonical(html: Column): Column =
    GraftBridge.column(HtmlCanonicalExpr(GraftBridge.expression(html)))
  def htmlRobots(html: Column): Column =
    GraftBridge.column(HtmlRobotsExpr(GraftBridge.expression(html)))
  def htmlFeedLinks(html: Column): Column =
    GraftBridge.column(HtmlFeedLinksExpr(GraftBridge.expression(html)))
}

abstract class HtmlMetaStringExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  protected def kernel: String // static method on graft.operators.HtmlMeta

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.operators.HtmlMeta.$kernel($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
}

case class HtmlTitleExpr(child: Expression) extends HtmlMetaStringExpr {
  override def prettyName: String = "graft_html_title"
  override protected def kernel: String = "titleUTF8"
  override def nullSafeEval(input: Any): Any =
    graft.operators.HtmlMeta.titleUTF8(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): HtmlTitleExpr =
    copy(child = newChild)
}

case class HtmlDescriptionExpr(child: Expression) extends HtmlMetaStringExpr {
  override def prettyName: String = "graft_html_description"
  override protected def kernel: String = "descriptionUTF8"
  override def nullSafeEval(input: Any): Any =
    graft.operators.HtmlMeta.descriptionUTF8(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): HtmlDescriptionExpr =
    copy(child = newChild)
}

case class HtmlCanonicalExpr(child: Expression) extends HtmlMetaStringExpr {
  override def prettyName: String = "graft_html_canonical"
  override protected def kernel: String = "canonicalUTF8"
  override def nullSafeEval(input: Any): Any =
    graft.operators.HtmlMeta.canonicalUTF8(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): HtmlCanonicalExpr =
    copy(child = newChild)
}

/** Feed autodiscovery hrefs — `array<string>` result (document order,
  * empty when the page advertises no feed). */
case class HtmlFeedLinksExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_html_feed_links"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    graft.operators.HtmlMeta.feedLinksArray(input.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.HtmlMeta.feedLinksArray($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlFeedLinksExpr =
    copy(child = newChild)
}

case class HtmlRobotsExpr(child: Expression) extends HtmlMetaStringExpr {
  override def prettyName: String = "graft_html_robots"
  override protected def kernel: String = "robotsContentUTF8"
  override def nullSafeEval(input: Any): Any =
    graft.operators.HtmlMeta.robotsContentUTF8(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): HtmlRobotsExpr =
    copy(child = newChild)
}
