package graft.operators

import org.apache.spark.unsafe.types.UTF8String

/** Serializable BFS-completed Aho–Corasick automaton over the 37-symbol
  * token alphabet ([a-z0-9] + separator); built by [[PhraseMatch]].
  * Top-level class (not object-nested) so codegen can name it directly
  * as a reference-object type. Matching is `state = goto(state*37+sym);
  * total += out(state)` per input symbol — no fail-link walking at match
  * time. */
final class AcAutomaton private[operators] (
    gotoTab: Array[Int], out: Array[Int]) extends Serializable {

  // single source of truth for the table layout — see PhraseMatch.SYMBOLS
  private def SYMBOLS = PhraseMatch.SYMBOLS
  private def SEP = PhraseMatch.SEP

  /** Total (position, phrase) match count over the normalized token
    * stream of `s`. Byte-level scan: any byte outside ASCII alnum
    * (including every byte of a multibyte character) is a separator,
    * and separator runs collapse to one SEP symbol — identical to
    * splitting lower(text) on non-[a-z0-9] runs. */
  def countHits(s: UTF8String): Long = {
    val n = s.numBytes()
    var state = gotoTab(SEP) // virtual leading separator
    var total = out(state).toLong
    var lastSep = true
    var i = 0
    while (i < n) {
      val sym = PhraseMatch.symbolOfByte(s.getByte(i))
      if (sym == SEP) {
        if (!lastSep) {
          state = gotoTab(state * SYMBOLS + SEP)
          total += out(state)
          lastSep = true
        }
      } else {
        state = gotoTab(state * SYMBOLS + sym)
        total += out(state)
        lastSep = false
      }
      i += 1
    }
    if (!lastSep) { // virtual trailing separator
      state = gotoTab(state * SYMBOLS + SEP)
      total += out(state)
    }
    total
  }
}
