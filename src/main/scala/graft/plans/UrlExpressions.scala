package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL host / registrable-domain extraction as native codegen'd
  * expressions — the [[LangIdExpr]] discipline: the kernel (and its
  * once-per-JVM rule sets) lives in [[graft.operators.UrlDomain]] as
  * plain statics, `doGenCode` emits one static call, and the extraction
  * stays inside whole-stage codegen instead of paying UDF ser/de per
  * URL. Both return null for null/hostless input; `graft_url_domain`
  * additionally returns null where no registrable domain exists (IP
  * literals, single labels, bare public suffixes). */
object UrlExpressions {

  import org.apache.spark.sql.GraftBridge

  def urlHost(url: Column): Column =
    GraftBridge.column(UrlHostExpr(GraftBridge.expression(url)))
  def urlDomain(url: Column): Column =
    GraftBridge.column(UrlDomainExpr(GraftBridge.expression(url)))
  def urlCanonical(url: Column): Column =
    GraftBridge.column(UrlCanonicalExpr(GraftBridge.expression(url)))
}

abstract class UrlStringExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  protected def kernel: String // static method on graft.operators.UrlDomain

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.operators.UrlDomain.$kernel($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
}

case class UrlHostExpr(child: Expression) extends UrlStringExpr {
  override def prettyName: String = "graft_url_host"
  override protected def kernel: String = "hostOfUTF8"
  override def nullSafeEval(input: Any): Any =
    graft.operators.UrlDomain.hostOfUTF8(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): UrlHostExpr =
    copy(child = newChild)
}

case class UrlDomainExpr(child: Expression) extends UrlStringExpr {
  override def prettyName: String = "graft_url_domain"
  override protected def kernel: String = "domainOfUrlUTF8"
  override def nullSafeEval(input: Any): Any =
    graft.operators.UrlDomain.domainOfUrlUTF8(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): UrlDomainExpr =
    copy(child = newChild)
}

case class UrlCanonicalExpr(child: Expression) extends UrlStringExpr {
  override def prettyName: String = "graft_url_canonical"
  override protected def kernel: String = "canonicalizeUrlUTF8"
  override def nullSafeEval(input: Any): Any =
    graft.operators.UrlDomain.canonicalizeUrlUTF8(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalExpr =
    copy(child = newChild)
}
