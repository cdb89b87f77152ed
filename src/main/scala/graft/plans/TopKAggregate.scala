package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k-per-group as a native Catalyst aggregate.
  *
  * The window-rank formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * s DESC) <= k`) shuffles and SORTS every row of every group; at 100 TB
  * that is the dominant cost of a per-source curation query. This
  * TypedImperativeAggregate keeps at most k (score, id) pairs per group —
  * partial aggregation runs map-side, so the shuffle carries k rows per
  * group per input partition instead of the whole corpus, and nothing is
  * ever globally sorted.
  *
  * Determinism: ranked by (score DESC, id ASC) — ties broken by the lower
  * id, matching the window formulation `ORDER BY score DESC, id`.
  * Null scores/ids are ignored. Result: `array<struct<id:bigint,
  * score:double>>` in rank order.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {
  require(k >= 1, "k must be >= 1")

  // "worst first": the queue's head is the element to evict — lowest score,
  // ties resolved so the HIGHER id is worse (lower ids win ties).
  private def worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_top_k_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got ${s.catalogString} and ${i.catalogString}")
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def insert(buf: mutable.PriorityQueue[(Double, Long)], cand: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(cand)
    else if (worstFirst.compare(cand, buf.head) < 0) { buf.dequeue(); buf.enqueue(cand) }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // dequeue order is worst-first; reverse for rank order (best first)
    val ranked = buf.clone().dequeueAll.reverse
    new GenericArrayData(ranked.map(p => InternalRow(p._2, p._1)).toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

/** Bottom-k (key, value) LONG pairs per group — the exact-integer sibling
  * of [[TopKByScore]] for the quantile sketch's 60-bit md5 priorities,
  * which a double score would corrupt above 2^53. Ranked ascending by
  * (key, value); result `array<struct<key:bigint,value:bigint>>` in rank
  * order. Same map-side-combine property: the shuffle carries ≤ k pairs
  * per group per input partition, never the group's rows. */
case class BottomKLongPairs(
    keyExpr: Expression,
    valueExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {
  require(k >= 1, "k must be >= 1")

  // max-heap on (key, value): the head is the LARGEST pair — the one a
  // smaller candidate evicts
  private def largestFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(x: (Long, Long), y: (Long, Long)): Int = {
      val c = java.lang.Long.compare(x._1, y._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def children: Seq[Expression] = Seq(keyExpr, valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("value", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_bottom_k_long_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    (keyExpr.dataType, valueExpr.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got ${a.catalogString} and ${b.catalogString}")
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(largestFirst)

  private def insert(buf: mutable.PriorityQueue[(Long, Long)], cand: (Long, Long)): Unit =
    if (buf.size < k) buf.enqueue(cand)
    else if (largestFirst.compare(cand, buf.head) < 0) { buf.dequeue(); buf.enqueue(cand) }

  override def update(
      buf: mutable.PriorityQueue[(Long, Long)], input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val a = keyExpr.eval(input)
    val b = valueExpr.eval(input)
    if (a != null && b != null) insert(buf, (a.asInstanceOf[Long], b.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    // dequeue order is largest-first; reverse for ascending rank order
    val ranked = buf.clone().dequeueAll.reverse
    new GenericArrayData(ranked.map(p => InternalRow(p._1, p._2)).toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (a, b) => bb.putLong(a); bb.putLong(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getLong, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKLongPairs =
    copy(keyExpr = newChildren(0), valueExpr = newChildren(1))
}

object TopKAggregate {
  import org.apache.spark.sql.GraftBridge

  /** Top-k (id, score) pairs per group by (score DESC, id ASC), as an
    * aggregate Column: `df.groupBy(g).agg(topKByScore(score, id, k))`. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKByScore(GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression())

  /** Bottom-k (key, value) long pairs per group by (key ASC, value ASC). */
  def bottomKLongPairs(key: Column, value: Column, k: Int): Column =
    GraftBridge.column(
      BottomKLongPairs(GraftBridge.expression(key), GraftBridge.expression(value), k)
        .toAggregateExpression())
}
