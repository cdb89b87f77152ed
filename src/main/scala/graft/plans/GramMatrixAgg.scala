package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass Gram/second-moment accumulator over integer-quantized vectors
  * — the covariance primitive PCA needs at 100 TB.
  *
  * The naive distributed covariance (`posexplode` the vector twice and
  * `groupBy (i, j)`) pushes rows × d² exploded structs through a hash
  * aggregate; for d = 64 that is a 4096× row blow-up ahead of the partial
  * aggregation. This TypedImperativeAggregate keeps the entire second-moment
  * state — count, per-dimension sums, and the upper-triangular Σ qᵢqⱼ —
  * in ONE flat long array of 1 + d + d(d+1)/2 entries per aggregation
  * buffer: each input row is d(d+1)/2 multiply-adds into the array, partial
  * aggregation runs map-side, and the shuffle carries one ~2 KB state per
  * map partition regardless of row count. Covariance, and from it the PCA
  * basis, is a driver-side O(d²) computation on the merged state
  * ([[graft.operators.Pca]]).
  *
  * Exactness contract: inputs are integer-quantized vectors (`array<bigint>`,
  * the `round(x · grid)` discipline of [[graft.operators.Quantization]]), so
  * every sum is EXACT integer arithmetic — reproducible across partitionings,
  * merge orders, and engines (the DuckDB oracle replays Σ qᵢqⱼ verbatim).
  * All accumulation uses `Math.addExact`/`multiplyExact`: an overflow at
  * extreme scale throws instead of silently wrapping into a wrong basis.
  * Ragged or null-element vectors throw — a corpus with mixed dimensions
  * is a pipeline bug upstream, not something to average over.
  */
case class GramMatrixAgg(
    vecExpr: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(d >= 1 && d <= 512, s"dimension must be in [1, 512], got $d")

  private val stateLen: Int = 1 + d + d * (d + 1) / 2

  override def children: Seq[Expression] = Seq(vecExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_matrix"

  override def checkInputDataTypes(): TypeCheckResult = vecExpr.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (integer-quantized vectors), got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](stateLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val raw = vecExpr.eval(input)
    if (raw == null) return buf // null vector = absent row, skip
    val arr = raw.asInstanceOf[ArrayData]
    require(arr.numElements() == d,
      s"$prettyName: expected $d-dimensional vectors, got ${arr.numElements()}")
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      require(!arr.isNullAt(i), s"$prettyName: null element at position $i")
      q(i) = arr.getLong(i)
      i += 1
    }
    buf(0) = Math.addExact(buf(0), 1L)
    i = 0
    var idx = 1 + d
    while (i < d) {
      buf(1 + i) = Math.addExact(buf(1 + i), q(i))
      var j = i
      while (j < d) {
        buf(idx) = Math.addExact(buf(idx), Math.multiplyExact(q(i), q(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < stateLen) { buf(i) = Math.addExact(buf(i), other(i)); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(stateLen * 8)
    var i = 0
    while (i < stateLen) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](stateLen)
    var i = 0
    while (i < stateLen) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramMatrixAgg =
    copy(vecExpr = newChildren(0))
}

object GramMatrixAgg {
  import org.apache.spark.sql.GraftBridge

  /** The second-moment state [n, sums(d), upper-tri products(d(d+1)/2)] as
    * an aggregate Column over `array<bigint>` quantized vectors. */
  def gramSketch(vec: Column, d: Int): Column =
    GraftBridge.column(
      GramMatrixAgg(GraftBridge.expression(vec), d).toAggregateExpression())
}
