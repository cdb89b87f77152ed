package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase blocklist matching via an Aho–Corasick automaton
  * (Aho & Corasick 1975, CACM 18(6)) over the normalized token stream:
  * text is lowercased and split on non-[a-z0-9] runs, phrases match whole
  * token SEQUENCES (word-boundary semantics, multi-word phrases
  * included), and every occurrence is counted — including occurrences
  * that share a boundary token position ("table table table" contains
  * "table table" twice), which per-phrase substring replace tricks
  * undercount.
  *
  * Why an automaton and not K predicates: [[TextAnalysis.blocklistHits]]
  * pays O(K) per token (array membership against the word list) and
  * cannot express multi-word phrases; regexp alternation compiles the
  * list into a backtracking scan. Aho–Corasick is ONE pass over the
  * bytes at O(1) amortized per byte REGARDLESS of K — the per-row cost
  * of a 10,000-phrase blocklist equals that of a 10-phrase one, which is
  * the regime real safety/PII phrase lists live in.
  *
  * Scale shape: the automaton is built once on the driver (bounded by
  * `maxPatternChars`, model-sized like the PQ codebooks), rides the plan
  * as a codegen reference object ([[graft.plans.PhraseHitsExpr]] — one
  * static-shaped virtual call per row inside whole-stage codegen), and
  * the scan is in-row: zero shuffle, zero UDF boxing. The goto table is
  * BFS-completed (no fail-link walking at match time), 37 symbols
  * ([a-z0-9] + the token separator) per node. */
object PhraseMatch {

  /** Build-size bound: nodes ≤ total normalized pattern chars + 2 per
    * phrase; the completed goto table costs 37 ints per node. */
  val maxPatternChars = 100000

  /** Token alphabet shared with [[AcAutomaton]] — the goto table is
    * indexed `state * SYMBOLS + sym` on BOTH the build and match side, so
    * these constants must have exactly one definition.
    *
    * CASE-FOLD CONTRACT (advisor r12): folding is ASCII-ONLY — exactly
    * [A-Z]→[a-z]; every non-ASCII byte is a separator. This is NOT
    * Unicode `lower()`, which can map non-ASCII chars INTO [a-z0-9]
    * (Kelvin sign U+212A → 'k', fullwidth Ａ-Ｚ) and would tokenize such
    * input differently. The `blocklist_phrases` oracle replays the same
    * contract with an ASCII-only `translate`, never `lower()`. */
  private[operators] val SYMBOLS = 37 // 26 letters, 10 digits, 1 separator
  private[operators] val SEP = 36

  private def symbolOf(b: Byte): Int = {
    if (b >= 'a' && b <= 'z') b - 'a'
    else if (b >= 'A' && b <= 'Z') b - 'A'
    else if (b >= '0' && b <= '9') 26 + (b - '0')
    else SEP
  }

  /** Normalized symbol stream of a phrase: SEP, tokens joined by single
    * SEP, SEP — so a phrase matches exactly at token boundaries. Empty
    * after normalization (no alnum content) is rejected at build. */
  private def phraseSymbols(p: String): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](p.length + 2)
    out += SEP
    var lastSep = true
    for (ch <- p) {
      val s = if (ch < 128) symbolOf(ch.toByte) else SEP
      if (s == SEP) {
        if (!lastSep) { out += SEP; lastSep = true }
      } else { out += s; lastSep = false }
    }
    if (!lastSep) out += SEP
    if (out.length <= 2) Array.empty else out.toArray
  }

  /** Bounded LRU (access-order LinkedHashMap): a long-lived executor
    * evaluating many distinct blocklists must not retain every goto table
    * forever — at the 100k-symbol bound each entry can hold ~15 MB
    * (review r12 finding). 8 automatons is generous for any one job;
    * eviction only costs a rebuild. */
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[Seq[String], AcAutomaton](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[String], AcAutomaton]): Boolean = size() > 8
    })

  /** Automaton for `phrases` (per-JVM cached — interpreted-eval paths on
    * executors rebuild once per phrase list, not per row/task). */
  def automaton(phrases: Seq[String]): AcAutomaton = {
    val key = phrases.toVector
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val built = build(key)
      cache.put(key, built)
      built
    }
  }

  private def build(phrases: Seq[String]): AcAutomaton = {
    require(phrases.nonEmpty, "empty phrase list matches nothing; pass the real list")
    val pats = phrases.map(phraseSymbols)
    pats.zip(phrases).foreach { case (p, raw) =>
      require(p.nonEmpty, s"phrase normalized to nothing: '$raw'")
    }
    val totalChars = pats.map(_.length).sum
    require(totalChars <= maxPatternChars,
      s"phrase list too large ($totalChars symbols > $maxPatternChars) — " +
        "the dense goto table is driver-built and plan-shipped; shard the list")
    // trie
    val maxNodes = totalChars + 1
    val next = Array.fill(maxNodes * SYMBOLS)(-1)
    val ends = new Array[Int](maxNodes)
    var nNodes = 1
    for (p <- pats) {
      var cur = 0
      for (sym <- p) {
        if (next(cur * SYMBOLS + sym) == -1) {
          next(cur * SYMBOLS + sym) = nNodes
          nNodes += 1
        }
        cur = next(cur * SYMBOLS + sym)
      }
      ends(cur) += 1
    }
    // BFS: fail links, completed goto, dictionary-suffix counts
    val fail = new Array[Int](nNodes)
    val out = new Array[Int](nNodes)
    val queue = new java.util.ArrayDeque[Int]()
    var s = 0
    while (s < SYMBOLS) {
      val v = next(s)
      if (v == -1) next(s) = 0
      else { fail(v) = 0; queue.add(v) }
      s += 1
    }
    out(0) = ends(0)
    while (!queue.isEmpty) {
      val u = queue.poll()
      out(u) = ends(u) + out(fail(u))
      var c = 0
      while (c < SYMBOLS) {
        val v = next(u * SYMBOLS + c)
        if (v == -1) next(u * SYMBOLS + c) = next(fail(u) * SYMBOLS + c)
        else { fail(v) = next(fail(u) * SYMBOLS + c); queue.add(v) }
        c += 1
      }
    }
    new AcAutomaton(java.util.Arrays.copyOf(next, nNodes * SYMBOLS), out)
  }

  private[operators] def symbolOfByte(b: Byte): Int = symbolOf(b)

  /** Column form: total whole-token-sequence occurrences of any phrase
    * in `text` (long; null text → null). */
  def phraseHits(text: Column, phrases: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.column(graft.plans.PhraseHitsExpr(
      org.apache.spark.sql.GraftBridge.expression(text), phrases))
}
