package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint kernel (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm): hash every character `k`-gram of the document, slide a
  * window of `w` consecutive hashes, and keep the minimum of each window
  * (ties broken toward the RIGHTMOST minimum, the paper's rule that makes
  * consecutive windows reuse the same selection). The selected hash set is
  * a position-robust fingerprint: any shared substring of length
  * >= k + w - 1 between two documents is GUARANTEED to contribute at least
  * one common fingerprint, while the set size is ~2/(w+1) of the gram
  * count — the density/guarantee trade the paper proves optimal.
  *
  * Same engineering rule as [[ViterbiKernel]]: per-row model compute runs
  * as a flat JVM loop inside a codegen'd expression, not interpreted HOF
  * lambdas (an O(n*w) comprehension per document interpreted per-element
  * is exactly the Viterbi regression measured in round 11).
  *
  * Cross-engine hash contract: hash(gram) = first 15 hex chars of
  * md5(utf8(gram)) read as a 60-bit integer — computable bit-identically
  * in DuckDB as `('0x' || substr(md5(g), 1, 15))::UBIGINT::BIGINT`, which
  * is what the `dedup_winnow` oracle does. Grams are CODEPOINT-based
  * (DuckDB string slicing is codepoint-based), so the kernel widens to a
  * codepoint array first; ASCII corpora take the cheap path inside
  * `String.codePoints`.
  *
  * Returns the DISTINCT selected hashes in first-selection order, or null
  * when the document has fewer than `k` codepoints (no gram exists). */
final class WinnowKernel(val k: Int, val w: Int) extends Serializable {
  require(k >= 2 && k <= 64, "gram length k in [2, 64]")
  require(w >= 2 && w <= 64, "window w in [2, 64]")

  /** Per-thread digest + output buffer: ~300 grams/document × millions of
    * documents makes per-gram allocation (gram String, getBytes copy,
    * fresh 16-byte digest array) the dominant cost — measured at sf0.1
    * the buffer-reusing byte-slice path below cut the operator's scan
    * roughly in half vs the String-per-gram first cut. */
  @transient private lazy val state: ThreadLocal[WinnowKernel.Scratch] =
    ThreadLocal.withInitial(() => new WinnowKernel.Scratch())

  def fingerprints(textU: UTF8String): ArrayData = {
    // grams are CODEPOINT-windows but hashing wants UTF-8 bytes: take the
    // string's UTF-8 bytes once and mark codepoint boundaries (a byte
    // starts a codepoint iff it is not a 10xxxxxx continuation byte), so
    // gram g covers bytes [off(g), off(g + k)) with zero copying
    val bytes = textU.getBytes
    val nb = bytes.length
    val off = new Array[Int](nb + 1)
    var ncp = 0
    var b = 0
    while (b < nb) {
      if ((bytes(b) & 0xc0) != 0x80) { off(ncp) = b; ncp += 1 }
      b += 1
    }
    off(ncp) = nb
    val n = ncp - k + 1 // gram count
    if (n < 1) return null
    val scratch = state.get()
    val md = scratch.md
    val out = scratch.out
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, off(i), off(i + k) - off(i))
      md.digest(out, 0, 16)
      var v = 0L
      var d = 0
      while (d < 8) { v = (v << 8) | (out(d) & 0xffL); d += 1 }
      h(i) = v >>> 4
      i += 1
    }
    val wEff = math.min(w, n)
    // rightmost-min per window; consecutive windows differ by one element,
    // so re-scan only when the previous selection falls out of the window
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var sel = -1
    var j = 0 // window start, 0-based; windows [j, j + wEff - 1]
    while (j <= n - wEff) {
      if (sel < j) {
        // previous selection expired: full scan, rightmost min wins
        sel = j
        var p = j + 1
        while (p <= j + wEff - 1) { if (h(p) <= h(sel)) sel = p; p += 1 }
      } else {
        // only the new rightmost element can displace the current min
        val p = j + wEff - 1
        if (h(p) <= h(sel)) sel = p
      }
      seen.add(h(sel))
      j += 1
    }
    val res = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { res(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(res)
  }
}

object WinnowKernel {
  /** Per-thread reusable digest + 16-byte output buffer. */
  final class Scratch {
    val md: java.security.MessageDigest = java.security.MessageDigest.getInstance("MD5")
    val out: Array[Byte] = new Array[Byte](16)
  }
}

/** Column wrapper: `winnow_fingerprints(text)` → array<long> of distinct
  * selected gram hashes (null when the text is shorter than k).
  *
  * Parameterized on (k, w), NOT on a kernel instance: a kernel field would
  * compare by reference (WinnowKernel has no value equals), so two
  * structurally identical winnow expressions would never be semantically
  * equal — defeating common-subexpression elimination and plan
  * canonicalization (advisor r12). The kernel is built lazily inside,
  * the same pattern PhraseHitsExpr uses with its phrase list. */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  @transient private lazy val kernel: WinnowKernel = new WinnowKernel(k, w)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    kernel.fingerprints(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowKernel", kernel, classOf[WinnowKernel].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.fingerprints($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintsExpr =
    copy(child = newChild)
}
