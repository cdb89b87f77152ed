package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Content-defined chunking as a native codegen'd expression over a
  * binary column — the [[MimeSniffExpression]] discipline: kernel in
  * [[graft.operators.Cdc]], one static call in `doGenCode`. Emits the
  * chunk INDEX (offset, size, hash), never chunk bytes. */
object CdcExpressions {

  import org.apache.spark.sql.GraftBridge

  def cdcChunks(bytes: Column, minSize: Int, normalSize: Int, maxSize: Int): Column =
    GraftBridge.column(
      CdcChunksExpr(GraftBridge.expression(bytes), minSize, normalSize, maxSize))
}

case class CdcChunksExpr(child: Expression, minSize: Int, normalSize: Int,
                         maxSize: Int) extends UnaryExpression {
  require(0 < minSize && minSize <= normalSize && normalSize <= maxSize,
    s"need 0 < minSize <= normalSize <= maxSize, got ($minSize, $normalSize, $maxSize)")

  override def prettyName: String = "graft_cdc_chunks"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    graft.operators.Cdc.chunksArray(
      input.asInstanceOf[Array[Byte]], minSize, normalSize, maxSize)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.Cdc.chunksArray($c, $minSize, $normalSize, $maxSize)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}
