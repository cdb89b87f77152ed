package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding: canonical decomposition (Unicode NFD) followed by
  * removal of every combining mark — non-spacing (Mn: é→e, ü→u, å→a,
  * ñ→n), spacing-combining (Mc: Devanagari vowel signs), and enclosing
  * (Me: U+20DD) — while characters with no canonical decomposition (ß,
  * ø, æ, ligatures, non-Latin base letters) pass through untouched.
  * This is exactly the contract of DuckDB/utf8proc `strip_accents`
  * (UTF8PROC_STRIPMARK removes all three mark categories — verified
  * empirically against का/कः/a⃝/é), which the `fold_accents` oracle
  * replays, and the standard normalization step a multilingual corpus
  * needs before exact/fingerprint dedup so that NFC and pre-decomposed
  * spellings of the SAME word (U+00E9 vs e+U+0301) collapse to one key.
  *
  * Scale shape: a pure per-row kernel invoked from a codegen'd expression
  * ([[graft.plans.FoldAccentsExpr]]) — one static call inside whole-stage
  * codegen, no UDF boxing. The ASCII fast path returns the input
  * UTF8String UNCOPIED (one byte scan, no Java String detour), so on a
  * mostly-ASCII corpus the fold costs a scan predicate, not an
  * allocation per row. */
object UnicodeFold {

  /** Per-row kernel: NFD + drop Mn/Mc/Me. Called from codegen. */
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
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    // final NFC: utf8proc's stripmark pipeline recomposes after stripping —
    // observable on Hangul, where NFD's Jamo (category Lo, not marks) must
    // recompose back to syllables ('한국' round-trips unchanged)
    UTF8String.fromString(java.text.Normalizer.normalize(sb, java.text.Normalizer.Form.NFC))
  }

  /** Column form: accent-folded `text`. */
  def foldAccents(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(graft.plans.FoldAccentsExpr(
      org.apache.spark.sql.GraftBridge.expression(text)))
}
