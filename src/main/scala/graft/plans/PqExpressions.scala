package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Product-quantization kernels as codegen'd expressions. The PQ
  * assignment / distance math was first written as nested higher-order
  * array functions over nested literals; HOF lambdas evaluate INTERPRETED
  * per element (~2k expression-node evaluations per row for m=8 x
  * nCodes=16 x subDim=8), and the measured IVFADC wall-clock went
  * super-linear purely on interpretation overhead (4.8 s at 10x -> 39 s
  * at 30x). These kernels run the identical integer arithmetic as flat
  * Java loops inside whole-stage codegen, with the codebook riding the
  * plan as a reference object — the same fix, for the same reason, as
  * [[ViterbiKernel]].
  *
  * All arithmetic matches the SQL oracles bit-for-bit: integer squared
  * L2, argmin ties to the FIRST (lowest-index) codeword, nothing
  * floating-point. */
final class PqKernel(cents: Array[Array[Array[Long]]]) extends Serializable {
  require(cents.nonEmpty && cents.forall(_.nonEmpty), "kernel needs >= 1 codeword per subspace")
  val m: Int = cents.length

  /** 1-based index of the nearest codeword per subspace (first-min wins
    * ties — the codeword lists are sorted by code id). */
  def nearest(qsubs: ArrayData): ArrayData = {
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val sub = qsubs.getArray(s)
      val codes = cents(s)
      var bestI = 0
      var bestD = Long.MaxValue
      var i = 0
      while (i < codes.length) {
        val c = codes(i)
        var d = 0L
        var j = 0
        while (j < c.length) { val x = sub.getLong(j) - c(j); d += x * x; j += 1 }
        if (d < bestD) { bestD = d; bestI = i }
        i += 1
      }
      out(s) = bestI + 1
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Sum over subspaces of the distance to the nearest codeword — the
    * reconstruction error. */
  def minDistSum(qsubs: ArrayData): Long = {
    var total = 0L
    var s = 0
    while (s < m) {
      val sub = qsubs.getArray(s)
      val codes = cents(s)
      var bestD = Long.MaxValue
      var i = 0
      while (i < codes.length) {
        val c = codes(i)
        var d = 0L
        var j = 0
        while (j < c.length) { val x = sub.getLong(j) - c(j); d += x * x; j += 1 }
        if (d < bestD) bestD = d
        i += 1
      }
      total += bestD
      s += 1
    }
    total
  }
}

/** Residual kernel: subtracts the per-subspace slice of a coarse
  * centroid (selected by list code) from the vector's subspaces. */
final class PqResidualKernel(coarse: Map[Long, Array[Long]], m: Int, subDim: Int)
  extends Serializable {
  def residual(qsubs: ArrayData, listCode: Long): ArrayData = {
    val cent = coarse(listCode)
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val sub = qsubs.getArray(s)
      val res = new Array[Any](subDim)
      var j = 0
      while (j < subDim) { res(j) = sub.getLong(j) - cent(s * subDim + j); j += 1 }
      out(s) = new GenericArrayData(res)
      s += 1
    }
    new GenericArrayData(out)
  }
}

private object PqTypes {
  val QSubsType: DataType = ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  def checkQSubs(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(ArrayType(LongType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<array<bigint>>, got ${other.catalogString}")
  }
}

/** `pq_nearest(qsubs)` → array<int> of 1-based nearest-codeword indices. */
case class PqNearestExpr(child: Expression, kernel: PqKernel) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PqTypes.checkQSubs(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_nearest"
  override def nullSafeEval(input: Any): Any = kernel.nearest(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.nearest($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqNearestExpr =
    copy(child = newChild)
}

/** `pq_min_dist_sum(qsubs)` → bigint reconstruction error. */
case class PqMinDistSumExpr(child: Expression, kernel: PqKernel) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PqTypes.checkQSubs(child.dataType, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_min_dist_sum"
  override def nullSafeEval(input: Any): Any = kernel.minDistSum(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.minDistSum($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqMinDistSumExpr =
    copy(child = newChild)
}

/** `pq_residual(qsubs, list_code)` → array<array<bigint>> residual
  * subspaces against the coarse centroid of `list_code`. */
case class PqResidualExpr(left: Expression, right: Expression, kernel: PqResidualKernel)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = PqTypes.checkQSubs(left.dataType, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else if (right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint list code, got ${right.dataType.catalogString}")
  }
  override def dataType: DataType = PqTypes.QSubsType
  override def prettyName: String = "pq_residual"
  override def nullSafeEval(q: Any, code: Any): Any =
    kernel.residual(q.asInstanceOf[ArrayData], code.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqResidualKernel", kernel, classOf[PqResidualKernel].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $ref.residual($q, $c);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqResidualExpr =
    copy(left = newLeft, right = newRight)
}
