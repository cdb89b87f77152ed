package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a string column.
  *
  * Spark ships `BloomFilterMightContain` for its own runtime row-level
  * filtering but keeps it internal (and keyed to `xxhash64` longs); the
  * public path would be a Scala UDF, which boxes, allocates a
  * `java.lang.String` per row, and breaks whole-stage codegen exactly where
  * the probe sits — in front of a corpus-sized explode. This expression
  * keeps the probe inside codegen and hashes the UTF8String's UTF-8 bytes
  * directly (`mightContainBinary`), allocating nothing per row but the
  * byte-array view Spark already materializes.
  *
  * The filter travels as its serialized byte image wrapped in
  * [[BloomImage]], which keeps STRUCTURAL equals/hashCode (a raw array
  * field would compare by reference and defeat Catalyst subexpression
  * elimination and plan/exchange reuse between identical probes) but backs
  * them with a cached SHA-256 digest — Catalyst calls equals/hashCode
  * repeatedly during canonicalization and exchange-reuse matching, and at
  * the documented scale (~100M grams, a 100+ MB image) a per-call byte scan
  * would dominate planning time (advisor r7). The filter is decoded once
  * per executor via a transient lazy val.
  */
case class BloomMightContain(child: Expression, image: BloomImage)
  extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(image.bytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  /** Probe entry point shared by interpreted eval and generated code. */
  def probe(s: UTF8String): Boolean = filter.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any = probe(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.probe($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Immutable Bloom byte image with digest-backed structural equality:
  * `hashCode` is cached and `equals` compares (length, SHA-256 digest)
  * instead of scanning the image — O(filter size) once per JVM, O(1) per
  * plan-tree comparison. SHA-256 makes digest equality safe to treat as
  * content equality. The caller hands over ownership of `bytes` (never
  * mutated after construction). */
final class BloomImage(val bytes: Array[Byte]) extends Serializable {
  @transient private lazy val digest: Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
  @transient override lazy val hashCode: Int =
    java.util.Arrays.hashCode(Array(bytes.length)) * 31 + java.util.Arrays.hashCode(digest)
  override def equals(o: Any): Boolean = o match {
    case that: BloomImage => (this eq that) ||
      (bytes.length == that.bytes.length && java.util.Arrays.equals(digest, that.digest))
    case _ => false
  }
  // TreeNode renders expression arguments into plan strings - never the
  // whole image
  override def toString: String = s"bloom[${bytes.length}B]"
}

/** Sharded variant: probes the CHUNK-LOCAL filter of a per-chunk sidecar
  * (the r18 frontier layout — 64 filters, each covering one hash chunk of
  * the store). `left` is the chunk index (long, already computed by the
  * caller from the same hash that partitioned the store), `right` the
  * string key. Keeps the probe inside whole-stage codegen like the
  * single-filter form; the image array decodes once per executor. */
case class BloomMightContainSharded(left: Expression, right: Expression,
                                    images: Vector[BloomImage])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  @transient private lazy val filters: Array[BloomFilter] =
    images.map(im => BloomFilter.readFrom(new ByteArrayInputStream(im.bytes))).toArray

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (org.apache.spark.sql.types.LongType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint chunk, string key), got (${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain_sharded"

  /** Probe entry point shared by interpreted eval and generated code.
    * An out-of-range chunk is a caller bug — loud, never a silent miss. */
  def probe(chunk: Long, s: UTF8String): Boolean = {
    require(chunk >= 0 && chunk < filters.length,
      s"chunk $chunk outside sidecar [0, ${filters.length})")
    filters(chunk.toInt).mightContainBinary(s.getBytes)
  }

  override def nullSafeEval(chunk: Any, input: Any): Any =
    probe(chunk.asInstanceOf[Long], input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomShardProbe", this,
      classOf[BloomMightContainSharded].getName)
    nullSafeCodeGen(ctx, ev, (c, v) => s"${ev.value} = $ref.probe($c, $v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainSharded =
    copy(left = newLeft, right = newRight)
}

object BloomExpression {

  /** Column probe for a built [[BloomFilter]] (serialized once here,
    * decoded once per executor). */
  def mightContain(c: Column, filter: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(BloomMightContain(GraftBridge.expression(c), new BloomImage(bos.toByteArray)))
  }

  /** Chunk-local probe over a per-chunk filter array (serialized images). */
  def mightContainSharded(chunk: Column, c: Column,
                          images: Seq[Array[Byte]]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(BloomMightContainSharded(
      GraftBridge.expression(chunk), GraftBridge.expression(c),
      images.map(new BloomImage(_)).toVector))
  }
}
