package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cavnar–Trenkle language id as a native expression: the kernel lives in
  * [[graft.operators.LangId]] (per-JVM broadcast-free profiles — plain
  * statics, nothing rides task closures) and `doGenCode` emits ONE static
  * call, so the classifier stays inside whole-stage codegen instead of
  * falling out through a UDF's ser/de and null-boxing path. Returns null
  * for null input and for text containing no letters (no evidence — no
  * confident guess). */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_langid"

  override def nullSafeEval(input: Any): Any =
    graft.operators.LangId.classifyUTF8(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.operators.LangId.classifyUTF8($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
