package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 robots.txt evaluation as a native codegen'd expression —
  * kernel + per-JVM memoized rule compilation in
  * [[graft.operators.Robots]], one static call inside whole-stage
  * codegen (the LangIdExpr discipline). The crawler's product token is a
  * plan-time constant: a pipeline crawls as ONE agent, and pinning it
  * keeps the expression binary and the memo key cheap.
  *
  * The expression itself is standard null-safe (null in → null out);
  * the MEANINGFUL null semantics (absent robots.txt → allowed, absent
  * path → not allowed) live in the [[RobotsExpression.allowed]] Column
  * builder as explicit `when` guards, where they are visible in the
  * plan instead of buried in eval. */
case class RobotsAllowedExpr(left: Expression, right: Expression, agent: String)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string robotsTxt, string path), got $other")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_allowed"

  override def nullSafeEval(txt: Any, path: Any): Any =
    graft.operators.Robots.isAllowedUTF8(
      txt.asInstanceOf[UTF8String], agent, path.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (t, p) => {
      s"""
         |${ev.value} = graft.operators.Robots.isAllowedUTF8($t, $agentRef, $p);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): RobotsAllowedExpr =
    copy(left = newLeft, right = newRight)
}

object RobotsExpression {
  import org.apache.spark.sql.GraftBridge
  import org.apache.spark.sql.functions.{lit, when}

  /** Allowed verdict with the RFC null semantics made explicit:
    * no robots.txt published → allowed; no path → not allowed. */
  def allowed(robotsTxt: Column, path: Column, agent: String): Column =
    when(path.isNull, lit(false))
      .when(robotsTxt.isNull, lit(true))
      .otherwise(GraftBridge.column(RobotsAllowedExpr(
        GraftBridge.expression(robotsTxt), GraftBridge.expression(path), agent)))
}
