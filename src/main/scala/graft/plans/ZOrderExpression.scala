package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of the low `bits` bits of two non-negative
  * long keys: result bit `2i` is x's bit `i`, bit `2i+1` is y's bit `i`.
  *
  * Range-partitioning + sorting on this key clusters rows that are close in
  * BOTH dimensions into the same files, so each file's per-column min/max
  * stats are tight on x AND y — the multi-dimensional data-skipping layout
  * (a linear sort on x leaves y's per-file ranges as wide as the table).
  * Codegen'd primitive loop; negative inputs are masked into the `bits`-bit
  * domain (caller buckets first).
  */
case class ZOrder2(left: Expression, right: Expression, bits: Int) extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got ${l.catalogString} and ${r.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder2"

  private val mask = (1L << bits) - 1

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long] & mask
    val y = b.asInstanceOf[Long] & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpression {
  import org.apache.spark.sql.GraftBridge

  def zorder2(x: Column, y: Column, bits: Int): Column =
    GraftBridge.column(ZOrder2(GraftBridge.expression(x), GraftBridge.expression(y), bits))
}
