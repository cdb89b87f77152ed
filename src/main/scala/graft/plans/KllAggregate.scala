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

/** KLL quantile sketch state (Karnin, Lang & Liberty 2016, "Optimal
  * Quantile Approximation in Streams", FOCS — the simplified equal-
  * capacity variant Manku–Rajagopalan–Lindsay-style, with KLL's random
  * compaction parity): per-level buffers where a level-h item carries
  * weight 2^h; a full level sorts, keeps a random parity (every other
  * element), and promotes the survivors one level up — halving the count
  * at doubled weight, so TOTAL WEIGHT IS CONSERVED EXACTLY (the
  * deterministic invariant the oracles pin, independent of the coins).
  *
  * Role in the sketch family: the bottom-k priority sample
  * ([[graft.operators.QuantileSketch]]) is the ENGINE-PORTABLE member —
  * its state is a function of the input multiset, replayed row-for-row
  * by DuckDB. KLL is the SPACE-OPTIMAL member — O((1/ε)·log log(1/δ))
  * items against the sample's O(1/ε²) — but its state depends on random
  * coins and on merge order, so another engine can never replay it:
  * oracles check its CONTRACT (rank error ≤ ε·n, weight conservation),
  * exactly how `vocab_cms` treats Spark's engine-private builtin sketch.
  *
  * Determinism note: each aggregation buffer's xorshift64 coin stream is
  * seeded from a constant mixed with a per-task nonce (partition id +
  * task attempt id) and with data-derived entropy, so buffers flip
  * INDEPENDENT coins even over replicated or identically-partitioned
  * data — the independence KLL's (ε, δ) analysis assumes. Driver-side
  * buffers (no TaskContext: tests, `stateOf`) keep the constant seed and
  * replay reproducibly; distributed runs never promised exact-state
  * determinism anyway (merge order varies run to run). The guarantee
  * that holds regardless is the (ε, δ) rank bound, which is what tests
  * and oracles assert (with ε at ~5×–10× the empirical error, so the
  * gate never flakes).
  *
  * Buffer: ≤ capacity items per level, ≤ ~log2(n/capacity)+1 levels —
  * a few thousand longs at any corpus size; partials combine map-side. */
final class KllState(val capacity: Int) extends Serializable {
  var levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])
  var rng: Long = 0x9E3779B97F4A7C15L ^ capacity
  var n: Long = 0L

  private def coin(): Boolean = {
    // xorshift64
    rng ^= rng << 13; rng ^= rng >>> 7; rng ^= rng << 17
    (rng & 1L) == 1L
  }

  /** Fold entropy into the coin stream, keeping it away from the all-zero
    * xorshift fixed point. KLL's (ε, δ) analysis assumes independent
    * compaction coins; a constant per-buffer seed correlates the coins of
    * every partition's buffer, and replicated or adversarially partitioned
    * input could then bias ranks beyond the modeled bound (advisor r13).
    * Data-derived entropy alone (first inserted value, merged partner's
    * stream) is NOT enough: replicated or identically-partitioned input
    * re-derives the same seed in every buffer (advisor r14), so the
    * aggregate also mixes a per-TASK nonce at buffer creation
    * ([[KllSketchAgg.createAggregationBuffer]]) — buffers are then
    * distinct even over identical data. The state stays fully serialized
    * (`rng` rides serialize/deserialize); determinism is the (ε, δ)
    * contract, never the exact retained set, which distributed merge
    * order already perturbs run-to-run. */
  def mixSeed(entropy: Long): Unit = {
    rng ^= java.lang.Long.rotateLeft(entropy * 0x9E3779B97F4A7C15L, 31)
    if (rng == 0L) rng = 0x9E3779B97F4A7C15L
  }

  def insert(v: Long): Unit = {
    if (n == 0L) mixSeed(v)
    levels(0) += v
    n += 1
    compactCascade()
  }

  /** Compact every over-capacity level bottom-up. Each compaction keeps
    * the randomly-chosen parity of the SORTED buffer: count halves,
    * weight doubles, total weight exact. */
  private def compactCascade(): Unit = {
    var h = 0
    while (h < levels.size) {
      if (levels(h).size >= capacity) {
        val sorted = levels(h).sorted
        val m = sorted.size
        // an odd buffer sets ONE element aside at the current level
        // BEFORE pairing (which end stays is itself a coin, to avoid
        // min/max bias); the even remainder promotes exactly half:
        // weight 2·(body/2)·2^h + kept·2^h == m·2^h — conserved exactly
        val odd = m % 2 == 1
        val keepLast = odd && coin()
        val (kept, lo, hi) =
          if (!odd) (-1, 0, m)
          else if (keepLast) (m - 1, 0, m - 1)
          else (0, 1, m)
        val offset = if (coin()) 1 else 0
        if (h + 1 == levels.size) levels += mutable.ArrayBuffer.empty[Long]
        val up = levels(h + 1)
        var i = lo + offset
        while (i < hi) { up += sorted(i); i += 2 }
        levels(h).clear()
        if (kept >= 0) levels(h) += sorted(kept)
      }
      h += 1
    }
  }

  def mergeIn(other: KllState): Unit = {
    mixSeed(other.rng)
    while (levels.size < other.levels.size) levels += mutable.ArrayBuffer.empty[Long]
    var h = 0
    while (h < other.levels.size) {
      levels(h) ++= other.levels(h)
      h += 1
    }
    n += other.n
    compactCascade()
  }

  /** Exact total weight — must equal `n` at all times. */
  def totalWeight: Long = {
    var w = 0L
    var h = 0
    while (h < levels.size) { w += levels(h).size.toLong << h; h += 1 }
    w
  }

  /** (level, value) pairs, the full retained state. */
  def items: Seq[(Int, Long)] =
    levels.zipWithIndex.flatMap { case (buf, h) => buf.map(v => (h, v)) }.toSeq

  /** Rank-q estimate on the x1e4 grid: the smallest retained value whose
    * cumulative weight reaches ⌈q·n⌉. */
  def estimate(qX1e4: Int): Long = {
    require(n > 0, "empty sketch")
    val target = math.max(1L, (qX1e4 * n + 9999L) / 10000L)
    val sorted = items.map { case (h, v) => (v, 1L << h) }.sortBy(_._1)
    var cum = 0L
    var i = 0
    while (i < sorted.size) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }
}

/** KLL as a Catalyst aggregate: `array<struct<level:int,v:bigint>>` of
  * the retained state (a few thousand rows at ANY corpus size), partials
  * combined map-side. Null values are ignored. */
case class KllSketchAgg(
    valueExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] {
  require(capacity >= 8 && capacity % 2 == 0 && capacity <= 65536,
    s"capacity must be even in [8, 65536], got $capacity")

  override def children: Seq[Expression] = Seq(valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("level", IntegerType, nullable = false),
    StructField("v", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_kll_sketch"

  override def checkInputDataTypes(): TypeCheckResult = valueExpr.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KllState = {
    val s = new KllState(capacity)
    // Per-task nonce: partition id + task attempt id make each buffer's
    // coin stream distinct even when the DATA in two buffers is identical
    // (replicated input, identical re-partitionings) — the case
    // data-derived entropy cannot separate (advisor r14). Absent a
    // TaskContext (driver-side eval, unit tests) the constant seed stands,
    // keeping single-threaded replays reproducible.
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) {
      s.mixSeed(tc.partitionId().toLong)
      s.mixSeed(tc.taskAttemptId())
    }
    s
  }

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = valueExpr.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KllState, other: KllState): KllState = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllState): Any =
    new GenericArrayData(buf.items.map { case (h, v) => InternalRow(h, v) }.toArray[Any])

  override def serialize(buf: KllState): Array[Byte] = {
    val items = buf.items
    val bb = ByteBuffer.allocate(8 + 8 + 4 + items.size * 12)
    bb.putLong(buf.n)
    bb.putLong(buf.rng)
    bb.putInt(items.size)
    items.foreach { case (h, v) => bb.putInt(h); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllState = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new KllState(capacity)
    s.n = bb.getLong
    s.rng = bb.getLong
    val m = bb.getInt
    var i = 0
    while (i < m) {
      val h = bb.getInt
      val v = bb.getLong
      while (s.levels.size <= h) s.levels += mutable.ArrayBuffer.empty[Long]
      s.levels(h) += v
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(valueExpr = newChildren(0))
}

object KllAggregate {
  import org.apache.spark.sql.GraftBridge

  /** The KLL state as an aggregate Column:
    * `df.agg(kllSketch(col, capacity))` → array<struct<level,v>>. */
  def kllSketch(value: Column, capacity: Int = 256): Column =
    GraftBridge.column(
      KllSketchAgg(GraftBridge.expression(value), capacity).toAggregateExpression())

  /** Rebuild a state from collected (level, v) items — the driver-side
    * path for estimating/merging sketches a query collected (states are
    * a few KB; estimates are integer arithmetic on them). */
  def stateOf(items: Seq[(Int, Long)], n: Long, capacity: Int = 256): KllState = {
    val s = new KllState(capacity)
    s.n = n
    items.foreach { case (h, v) =>
      while (s.levels.size <= h) s.levels += mutable.ArrayBuffer.empty[Long]
      s.levels(h) += v
    }
    require(s.totalWeight == n,
      s"corrupt KLL state: total weight ${s.totalWeight} != n $n")
    s
  }
}
