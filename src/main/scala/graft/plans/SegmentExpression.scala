package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fewest-token Viterbi segmentation kernel — the per-word DP behind
  * [[graft.operators.Segment.viterbiSegment]]. A first cut expressed the
  * DP as nested higher-order array functions over a map literal; HOF
  * lambdas evaluate INTERPRETED per element, and the measured cost was
  * ~80 ms per distinct word (75 s for the sf0.1 corpus — the whole
  * operator budget burned on expression-tree interpretation). The same
  * DP as a flat Java loop in a codegen'd expression runs in microseconds:
  * the vocabulary rides the expression as a reference object (a
  * HashSet — plan-literal-sized, never a join), and `doGenCode` emits one
  * kernel call so segmentation stays inside whole-stage codegen.
  *
  * Objective: minimize token count; ties prefer the LONGEST final token
  * at every DP cell (deterministic backtrack). The inner loop is bounded
  * by the longest vocabulary token, not the word length — O(len *
  * maxTokenLen) membership probes per word. Returns null for words that
  * are empty, longer than `maxWordLen`, or not coverable by the vocab. */
final class ViterbiKernel(vocab: Array[String], val maxWordLen: Int) extends Serializable {
  private val vset = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }
  private val maxTokLen = if (vocab.isEmpty) 0 else vocab.iterator.map(_.length).max
  private val Unreachable = Int.MaxValue - 1

  def segment(wordU: UTF8String): ArrayData = {
    val word = wordU.toString
    val n = word.length
    if (n < 1 || n > maxWordLen || maxTokLen == 0) return null
    val cost = new Array[Int](n + 1)
    val lastLen = new Array[Int](n + 1)
    java.util.Arrays.fill(cost, Unreachable)
    cost(0) = 0
    var j = 1
    while (j <= n) {
      val lMax = math.min(j, maxTokLen)
      var l = 1
      while (l <= lMax) {
        val prev = cost(j - l)
        if (prev != Unreachable && vset.contains(word.substring(j - l, j))) {
          val c = prev + 1
          if (c < cost(j) || (c == cost(j) && l > lastLen(j))) {
            cost(j) = c; lastLen(j) = l
          }
        }
        l += 1
      }
      j += 1
    }
    if (cost(n) == Unreachable) return null
    val out = new Array[Any](cost(n))
    var pos = n
    var i = cost(n) - 1
    while (pos > 0) {
      val l = lastLen(pos)
      out(i) = UTF8String.fromString(word.substring(pos - l, pos))
      pos -= l; i -= 1
    }
    new GenericArrayData(out)
  }
}

/** Column wrapper: `viterbi_segment(word)` → array<string> token
  * segmentation (null when unsegmentable). */
case class ViterbiSegmentExpr(child: Expression, kernel: ViterbiKernel)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "viterbi_segment"

  override def nullSafeEval(input: Any): Any =
    kernel.segment(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("viterbiKernel", kernel, classOf[ViterbiKernel].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.segment($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ViterbiSegmentExpr =
    copy(child = newChild)
}
