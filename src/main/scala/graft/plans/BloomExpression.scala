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
  * The filter travels as its serialized byte image — as an immutable
  * `Seq[Byte]` rather than a raw array, so the case class keeps
  * STRUCTURAL equals/hashCode (array fields compare by reference, which
  * would defeat Catalyst subexpression elimination and plan/exchange
  * reuse between identical probes) — and is decoded once per executor via
  * a transient lazy val.
  */
case class BloomMightContain(child: Expression, filterBytes: scala.collection.immutable.ArraySeq[Byte])
  extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes.unsafeArray.asInstanceOf[Array[Byte]]))

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

object BloomExpression {

  /** Column probe for a built [[BloomFilter]] (serialized once here,
    * decoded once per executor). */
  def mightContain(c: Column, filter: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(BloomMightContain(GraftBridge.expression(c),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bos.toByteArray)))
  }
}
