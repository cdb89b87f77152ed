package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick phrase-hit count as a native expression: the automaton is
  * resolved once per phrase list through [[graft.operators.PhraseMatch]]'s
  * per-JVM cache and rides the generated class as a codegen reference
  * object, so matching is one virtual call per row inside whole-stage
  * codegen — no UDF, no per-task automaton rebuild, no K-sized
  * per-token membership probe. */
case class PhraseHitsExpr(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_phrase_hits"

  @transient private lazy val ac = graft.operators.PhraseMatch.automaton(phrases)

  override def nullSafeEval(input: Any): Any =
    ac.countHits(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac,
      classOf[graft.operators.AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.countHits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseHitsExpr =
    copy(child = newChild)
}
