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

  // float arrays are accepted alongside double: embeddings are float32 at
  // the source, and forcing a cast to array<double> before a shuffle-side
  // verify join DOUBLES the dominant byte payload for zero information —
  // the accumulator is double either way, so the result is identical to
  // casting first.
  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
      Some(org.apache.spark.sql.types.FloatType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = (elemType(left.dataType), elemType(right.dataType)) match {
    case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_product"

  @transient private lazy val leftIsFloat =
    elemType(left.dataType).contains(org.apache.spark.sql.types.FloatType)
  @transient private lazy val rightIsFloat =
    elemType(right.dataType).contains(org.apache.spark.sql.types.FloatType)

  // NULL contract, matching the aggregate(zip_with(...)) equivalent this
  // expression replaces: a length mismatch or a null ELEMENT yields null —
  // never a silently-truncated or zero-padded "confident" score. The
  // element check is compiled in only when the schema admits null elements.
  override def nullable: Boolean = true
  @transient private lazy val mayHaveNullElems =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (mayHaveNullElems && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val getX = if (leftIsFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (rightIsFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      val nullElemCheck =
        if (mayHaveNullElems) s"if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; continue; }"
        else ""
      s"""
         |int $n = $x.numElements();
         |boolean $bad = $n != $y.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  $nullElemCheck
         |  $acc += $getX * $getY;
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
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

  // dimension mismatch or a null element => null signature (the row drops
  // out of banding) — zero-padding a truncated vector would bucket corrupt
  // data with confidence instead of surfacing it
  override def nullable: Boolean = true
  @transient private lazy val mayHaveNullElems =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    if (emb.numElements() != dim) return null
    if (mayHaveNullElems) {
      var i = 0
      while (i < dim) { if (emb.isNullAt(i)) return null; i += 1 }
    }
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var acc = 0.0
      val base = b * dim
      var i = 0
      while (i < dim) { acc += flat(base + i) * emb.getFloat(i); i += 1 }
      if (acc >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, emb => {
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val nullScan =
        if (mayHaveNullElems)
          s"for (int $j = 0; $j < $dim && !$bad; $j++) { if ($emb.isNullAt($j)) $bad = true; }"
        else ""
      s"""
         |boolean $bad = $emb.numElements() != $dim;
         |$nullScan
         |if ($bad) { ${ev.isNull} = true; } else {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    double $acc = 0.0;
         |    int $base = $b * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += $planesRef[$base + $i] * $emb.getFloat($i);
         |    }
         |    if ($acc >= 0) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
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

  // same null contract as HyperplaneSignature: a corrupt (wrong-dim or
  // null-element) vector must not be confidently routed to a cell
  override def nullable: Boolean = true
  @transient private lazy val mayHaveNullElems =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    if (emb.numElements() != dim) return null
    if (mayHaveNullElems) {
      var i = 0
      while (i < dim) { if (emb.isNullAt(i)) return null; i += 1 }
    }
    var best = -1
    var bestScore = Double.MinValue
    var c = 0
    while (c < k) {
      var acc = 0.0
      val base = c * dim
      var i = 0
      while (i < dim) { acc += flat(base + i) * emb.getFloat(i); i += 1 }
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
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      val score = ctx.freshName("score")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val nullScan =
        if (mayHaveNullElems)
          s"for (int $j = 0; $j < $dim && !$bad; $j++) { if ($emb.isNullAt($j)) $bad = true; }"
        else ""
      s"""
         |boolean $bad = $emb.numElements() != $dim;
         |$nullScan
         |if ($bad) { ${ev.isNull} = true; } else {
         |  int $best = -1;
         |  double $bestScore = -java.lang.Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    int $base = $c * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += $centsRef[$base + $i] * $emb.getFloat($i);
         |    }
         |    double $score = $acc * $invRef[$c];
         |    if ($score > $bestScore) { $bestScore = $score; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** MinHash signature over an `array<bigint>` of shingle hashes: element i of
  * the result is min over shingles x of (a_i * x + b_i) mod (2^61 - 1), with
  * the exact 128-bit mulMod the Scala implementation used (2^64 = 8 mod p).
  * The permutation coefficient arrays ride as codegen references; the k x n
  * loop runs primitively — this is the dominant CPU of minhash candidate
  * generation and the last dedup hot path that paid per-element boxing. */
case class MinHashSignature(child: Expression, as: Seq[Long], bs: Seq[Long])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(as.nonEmpty && as.length == bs.length, "as/bs must be equal-length and non-empty")

  private val k = as.length
  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  private val P = (1L << 61) - 1

  // a null shingle hash would otherwise read as x=0 and inject a phantom
  // candidate (v = b mod p) into every permutation's min — null in, null out
  override def nullable: Boolean = true
  @transient private lazy val mayHaveNullElems =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (mayHaveNullElems) {
      var j = 0
      while (j < n) { if (hs.isNullAt(j)) return null; j += 1 }
    }
    val out = Array.fill(k)(Long.MaxValue)
    if (n > 0) {
      val xm = new Array[Long](n)
      var j = 0
      while (j < n) { xm(j) = java.lang.Math.floorMod(hs.getLong(j), P); j += 1 }
      var i = 0
      while (i < k) {
        val a = aArr(i); val b = bArr(i)
        var mn = Long.MaxValue
        j = 0
        while (j < n) {
          val x = xm(j)
          val hi = java.lang.Math.multiplyHigh(a, x)
          val lo = a * x
          val loMod = java.lang.Math.floorMod(lo, P) + (if (lo < 0) 8L else 0L)
          val v = (java.lang.Math.floorMod(hi * 8 + loMod, P) + b) % P
          if (v < mn) mn = v
          j += 1
        }
        out(i) = mn
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashAs", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashBs", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val xm = ctx.freshName("xm")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val mn = ctx.freshName("mn")
      val x = ctx.freshName("x")
      val hi = ctx.freshName("hi")
      val lo = ctx.freshName("lo")
      val loMod = ctx.freshName("loMod")
      val v = ctx.freshName("v")
      val bad = ctx.freshName("bad")
      val jj = ctx.freshName("jj")
      val nullScan =
        if (mayHaveNullElems)
          s"for (int $jj = 0; $jj < $n && !$bad; $jj++) { if ($hs.isNullAt($jj)) $bad = true; }"
        else ""
      s"""
         |int $n = $hs.numElements();
         |boolean $bad = false;
         |$nullScan
         |if ($bad) { ${ev.isNull} = true; } else {
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |if ($n > 0) {
         |  long[] $xm = new long[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $xm[$j] = java.lang.Math.floorMod($hs.getLong($j), ${P}L);
         |  }
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $a = $aRef[$i]; long $b = $bRef[$i];
         |    long $mn = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $n; $j++) {
         |      long $x = $xm[$j];
         |      long $hi = java.lang.Math.multiplyHigh($a, $x);
         |      long $lo = $a * $x;
         |      long $loMod = java.lang.Math.floorMod($lo, ${P}L) + (($lo < 0) ? 8L : 0L);
         |      long $v = (java.lang.Math.floorMod($hi * 8 + $loMod, ${P}L) + $b) % ${P}L;
         |      if ($v < $mn) $mn = $v;
         |    }
         |    $out[$i] = $mn;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Static kernel for [[SimHash64]] — a plain object so generated code can
  * call the static forwarder `graft.plans.SimHashKernel.tokenHash(...)`
  * without reflection. The hash is the same 2-seed MurmurHash3 combination
  * the original Scala UDF used, so signatures are value-identical across
  * the migration. */
object SimHashKernel {
  def tokenHash(t: String): Long =
    scala.util.hashing.MurmurHash3.stringHash(t, 0x51_7c_c1_b7).toLong << 32 |
      (scala.util.hashing.MurmurHash3.stringHash(t, 0x27_22_0a_95).toLong & 0xffffffffL)
}

/** 64-bit SimHash over an `array<string>` token column: per token a 64-bit
  * hash votes each bit up or down; the signature sets the bits with positive
  * tally. Replaces the last boxed Scala UDF on a dedup hot path — the UDF
  * paid a Seq[String] conversion per row; here the token loop runs on
  * ArrayData inside whole-stage codegen. NULL input yields NULL (the UDF
  * returned 0L, which let null-text docs bucket together downstream). */
case class SimHash64(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val acc = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!toks.isNullAt(j)) {
        val h = SimHashKernel.tokenHash(toks.getUTF8String(j).toString)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |int $n = $toks.numElements();
         |int[] $acc = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$toks.isNullAt($j)) {
         |    long $h = graft.plans.SimHashKernel.tokenHash($toks.getUTF8String($j).toString());
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $acc[$b]++; else $acc[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($acc[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
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

  /** MinHash signature of an array<bigint> column for the given (a, b)
    * permutation coefficients over the 2^61-1 field. */
  def minhashSignature(hashes: Column, as: Array[Long], bs: Array[Long]): Column =
    GraftBridge.column(MinHashSignature(
      GraftBridge.expression(hashes), as.toIndexedSeq, bs.toIndexedSeq))

  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
}
