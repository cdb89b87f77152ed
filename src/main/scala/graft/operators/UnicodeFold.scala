package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding: canonical decomposition (Unicode NFD) followed by
  * removal of every non-spacing combining mark (category Mn) — é→e, ü→u,
  * å→a, ñ→n — while characters with no canonical decomposition (ß, ø, æ,
  * ligatures, non-Latin scripts) pass through untouched. This is exactly
  * the contract of DuckDB/utf8proc `strip_accents`, which the
  * `fold_accents` oracle replays, and the standard normalization step a
  * multilingual corpus needs before exact/fingerprint dedup so that NFC
  * and pre-decomposed spellings of the SAME word (U+00E9 vs e+U+0301)
  * collapse to one key.
  *
  * Scale shape: a pure per-row kernel invoked from a codegen'd expression
  * ([[graft.plans.FoldAccentsExpr]]) — one static call inside whole-stage
  * codegen, no UDF boxing. The ASCII fast path returns the input
  * UTF8String UNCOPIED (one byte scan, no Java String detour), so on a
  * mostly-ASCII corpus the fold costs a scan predicate, not an
  * allocation per row. */
object UnicodeFold {

  /** Per-row kernel: NFD + drop Mn. Called from codegen. */
  def foldAccentsUTF8(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column form: accent-folded `text`. */
  def foldAccents(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.plans.FoldAccentsExpr(
      org.apache.spark.sql.GraftBridge.expression(text)))
}
