package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order functions (`aggregate(zip_with(...))`) evaluate their
  * lambdas interpreted, per element — on an O(n^2) cosine-verification stage
  * that interpretation dominates. This expression generates a primitive Java
  * loop via `doGenCode`, keeping the dot product inside whole-stage codegen
  * with zero boxing. Preference order per the build rules: builtins first
  * (used everywhere else), custom Expression where builtins can't deliver the
  * needed shape — this is that case.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got ${l.catalogString} and ${r.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Sign-of-projection LSH signature over an `array<float>` embedding: bit b
  * of the result is set iff dot(embedding, plane_b) >= 0. The plane matrix
  * (nBits x dim, row-major) rides along as a codegen reference object, and
  * the double loop runs primitively inside whole-stage codegen — the Scala
  * UDF it replaces paid a boxed Seq[Float] conversion per row on the two
  * LSH operators' hottest stage. */
case class HyperplaneSignature(child: Expression, planes: Seq[Double], nBits: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nBits >= 1 && nBits <= 64 && planes.length % nBits == 0,
    "planes must be nBits rows of equal dimension, nBits in [1, 64]")

  private val dim = planes.length / nBits
  @transient private lazy val flat: Array[Double] = planes.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_hyperplane_sig"

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val n = math.min(emb.numElements(), dim)
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var acc = 0.0
      val base = b * dim
      var i = 0
      while (i < n) { acc += flat(base + i) * emb.getFloat(i); i += 1 }
      if (acc >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, emb => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($emb.numElements(), $dim);
         |long $sig = 0L;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  double $acc = 0.0;
         |  int $base = $b * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $planesRef[$base + $i] * $emb.getFloat($i);
         |  }
         |  if ($acc >= 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

/** Nearest-centroid id for an `array<float>` embedding against a k x dim
  * centroid matrix (cosine scoring; centroid norms precomputed). The IVF
  * routing pass runs this per row — generated primitive loops keep it in
  * whole-stage codegen, matching [[HyperplaneSignature]]'s shape. */
case class NearestCentroid(child: Expression, centroids: Seq[Double], k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1 && centroids.length % k == 0, "centroids must be k rows of equal dimension")

  private val dim = centroids.length / k
  @transient private lazy val flat: Array[Double] = centroids.toArray
  @transient private lazy val invNorms: Array[Double] = Array.tabulate(k) { c =>
    var acc = 0.0
    var i = 0
    while (i < dim) { val v = flat(c * dim + i); acc += v * v; i += 1 }
    val n = math.sqrt(acc)
    if (n > 0) 1.0 / n else 1.0
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val n = math.min(emb.numElements(), dim)
    var best = -1
    var bestScore = Double.MinValue
    var c = 0
    while (c < k) {
      var acc = 0.0
      val base = c * dim
      var i = 0
      while (i < n) { acc += flat(base + i) * emb.getFloat(i); i += 1 }
      val score = acc * invNorms(c)
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val invRef = ctx.addReferenceObj("invNorms", invNorms, "double[]")
    nullSafeCodeGen(ctx, ev, emb => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      val score = ctx.freshName("score")
      s"""
         |int $n = java.lang.Math.min($emb.numElements(), $dim);
         |int $best = -1;
         |double $bestScore = -java.lang.Double.MAX_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  double $acc = 0.0;
         |  int $base = $c * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $centsRef[$base + $i] * $emb.getFloat($i);
         |  }
         |  double $score = $acc * $invRef[$c];
         |  if ($score > $bestScore) { $bestScore = $score; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftBridge

  /** dot(a, b) over array<double> columns as a codegen'd native expression. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Sign-of-projection signature of an array<float> column for the given
    * plane matrix (rows = bits). */
  def hyperplaneSig(emb: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(HyperplaneSignature(
      GraftBridge.expression(emb), planes.flatten.toIndexedSeq, planes.length))

  /** Nearest-centroid id (cosine) of an array<float> column for the given
    * centroid matrix (rows = lists). */
  def nearestCentroid(emb: Column, centroids: Array[Array[Double]]): Column =
    GraftBridge.column(NearestCentroid(
      GraftBridge.expression(emb), centroids.flatten.toIndexedSeq, centroids.length))
}
