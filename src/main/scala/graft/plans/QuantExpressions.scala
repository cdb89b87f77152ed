package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen expressions for int8 embedding quantization.
  *
  * At 100 TB an `array<float>` embedding column is the dominant storage and
  * shuffle cost of a similarity pipeline; symmetric int8 quantization cuts it
  * 4x (plus one double scale per vector) at <= scale/2 absolute
  * reconstruction error per element. These run as primitive loops inside
  * whole-stage codegen — the higher-order-function equivalent
  * (`transform`/`aggregate`) evaluates its lambda interpreted per element
  * (see [[DotProduct]]'s rationale).
  *
  * Arithmetic contract (kept bit-reproducible across engines, incl. the
  * DuckDB oracle): values widen float->double; `scale = max(|v|)/127`;
  * `q = clamp(floor(v/scale + 0.5), -127, 127)` (round-half-up; a
  * non-positive scale — the all-zero vector — quantizes to zeros); null
  * elements quantize to 0.
  */
case class MaxAbs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_max_abs"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = math.abs(a.getFloat(i).toDouble)
        if (v > m) m = v
      }
      i += 1
    }
    m
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = java.lang.Math.abs((double) $a.getFloat($i));
         |    if ($v > $m) $m = $v;
         |  }
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxAbs =
    copy(child = newChild)
}

/** `q[i] = clamp(floor(v[i]/scale + 0.5), -127, 127)` as `array<int>`;
  * non-positive scale => all zeros. Int elements (not tinyint) keep the
  * downstream sum/compare arithmetic promotion-free; the 4x wire/storage
  * win is realized at the sink by casting the proven-in-range values. */
case class QuantizeInt8(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, double), got ${l.catalogString} and ${r.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_quantize_int8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val scale = b.asInstanceOf[Double]
    val n = emb.numElements()
    val out = new Array[Int](n)
    if (scale > 0) {
      var i = 0
      while (i < n) {
        if (!emb.isNullAt(i)) {
          val f = math.floor(emb.getFloat(i).toDouble / scale + 0.5)
          out(i) = if (f > 127.0) 127 else if (f < -127.0) -127 else f.toInt
        }
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, scale) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val f = ctx.freshName("f")
      s"""
         |int $n = $emb.numElements();
         |int[] $out = new int[$n];
         |if ($scale > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$emb.isNullAt($i)) {
         |      double $f = java.lang.Math.floor((double) $emb.getFloat($i) / $scale + 0.5);
         |      $out[$i] = $f > 127.0 ? 127 : ($f < -127.0 ? -127 : (int) $f);
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantizeInt8 =
    copy(left = newLeft, right = newRight)
}

/** `max_i |q[i]*scale - v[i]|` — the reconstruction error of a quantized
  * vector against its original, for error-bound contracts and re-ranking
  * decisions. */
case class DequantMaxError(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<int>, double), got " +
          s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dequant_max_error"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    val scale = c.asInstanceOf[Double]
    val n = math.min(emb.numElements(), q.numElements())
    var m = 0.0
    var i = 0
    while (i < n) {
      if (!emb.isNullAt(i) && !q.isNullAt(i)) {
        val e = math.abs(q.getInt(i) * scale - emb.getFloat(i).toDouble)
        if (e > m) m = e
      }
      i += 1
    }
    m
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, q, scale) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val e = ctx.freshName("e")
      s"""
         |int $n = java.lang.Math.min($emb.numElements(), $q.numElements());
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$emb.isNullAt($i) && !$q.isNullAt($i)) {
         |    double $e = java.lang.Math.abs($q.getInt($i) * $scale - (double) $emb.getFloat($i));
         |    if ($e > $m) $m = $e;
         |  }
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): DequantMaxError =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object QuantExpressions {
  import org.apache.spark.sql.GraftBridge

  def maxAbs(vec: Column): Column =
    GraftBridge.column(MaxAbs(GraftBridge.expression(vec)))

  def quantizeInt8(vec: Column, scale: Column): Column =
    GraftBridge.column(QuantizeInt8(GraftBridge.expression(vec), GraftBridge.expression(scale)))

  def dequantMaxError(vec: Column, q: Column, scale: Column): Column =
    GraftBridge.column(DequantMaxError(
      GraftBridge.expression(vec), GraftBridge.expression(q), GraftBridge.expression(scale)))
}
