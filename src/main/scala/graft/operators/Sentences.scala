package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rule-based sentence segmentation — the text-pipeline step between
  * document extraction and any sentence-level operator (sentence dedup,
  * parallel-corpus alignment, quality rules that price sentence length,
  * sentence-bounded chunking for embedding models).
  *
  * The reference has no analog (its unit is the whole column value);
  * at corpus scale the segmenter's plan shape matters more than its
  * linguistics: this one is a chain of `regexp_replace`/`split`/
  * `transform` BUILTINS — one narrow codegen'd projection per document,
  * no UDF, no shuffle, sentences born distributed with their parents
  * (the same shape argument as [[Chunking]]).
  *
  * Semantics (deterministic, engine-replayable — every rule is plain
  * leftmost regex rewriting, no lookaround, so the same passes run
  * under Java regex here and RE2 in the DuckDB oracle):
  *   1. protect known abbreviations: `Mr. Dr. vs. etc.` and the
  *      dotted pair `e.g./i.e.` get their periods swapped to a
  *      sentinel so rule 3 cannot split after them;
  *   2. protect decimal points between digits (`3.14`);
  *   3. a terminator `[.!?]`, optionally followed by closing quotes/
  *      brackets, followed by whitespace ends a sentence (the
  *      whitespace is consumed — it IS the boundary);
  *   4. CJK terminators `。！？` end a sentence with no whitespace
  *      required (scriptio continua — the load-bearing arm for zh/ja
  *      text coming off the WARC charset ladder);
  *   5. split on the boundary sentinel, restore protected periods,
  *      trim, drop empties.
  *
  * Scale: pure per-row projection — inherits the scan's partitioning,
  * survives 100× by construction; the only cost is regex CPU, all
  * inside whole-stage codegen.
  */
object Sentences {

  /** Single-dot abbreviations whose trailing period never ends a
    * sentence. Deliberately small and closed: a corpus-tuned list is a
    * config concern; the operator contract is the mechanism. */
  val abbreviations: Seq[String] = Seq(
    "Mr", "Mrs", "Ms", "Dr", "Prof", "St", "Jr", "Sr", "vs", "etc",
    "Inc", "Ltd", "Co", "Corp", "Fig", "Vol", "No", "approx")

  // Sentinels from the C0 range: cannot occur in sane text, and both
  // engines treat them as plain single characters.
  private val ProtDot = "\u0001" // a period proven non-terminal
  private val Bound = "\u0002"   // a sentence boundary

  private val abbrevRe = "\\b(" + abbreviations.mkString("|") + ")\\."
  private val dottedPairRe = "\\b([eE])\\.([gG])\\.|\\b([iI])\\.([eE])\\."
  private val decimalRe = "(\\d)\\.(\\d)"
  private val latinEndRe = "([.!?])([\"'’”)\\]]*)(\\s+)"
  private val cjkEndRe = "([。！？])"

  /** `array<string>` of trimmed, non-empty sentences. */
  def splitSentences(text: Column): Column = {
    val p1 = regexp_replace(text, abbrevRe, "$1" + ProtDot)
    val p2 = regexp_replace(p1, dottedPairRe,
      "$1$3" + ProtDot + "$2$4" + ProtDot)
    val p3 = regexp_replace(p2, decimalRe, "$1" + ProtDot + "$2")
    val b1 = regexp_replace(p3, latinEndRe, "$1$2" + Bound)
    val b2 = regexp_replace(b1, cjkEndRe, "$1" + Bound)
    filter(
      transform(split(b2, Bound), s => trim(translate(s, ProtDot, "."))),
      s => length(s) > 0)
  }

  /** The DuckDB replay of [[splitSentences]] over a SQL expression
    * producing the text — same passes, RE2 dialect (`\1` backrefs,
    * `chr()` sentinels). Kept NEXT TO the Scala so the two dialects
    * evolve together; used by the oracle registry. */
  def duckdbSplitSql(textExpr: String): String = {
    val abbrev = abbreviations.mkString("|")
    s"list_filter(list_transform(string_split(" +
      s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"$textExpr, " +
      s"'\\b($abbrev)\\.', '\\1' || chr(1), 'g'), " +
      s"'\\b([eE])\\.([gG])\\.|\\b([iI])\\.([eE])\\.', '\\1\\3' || chr(1) || '\\2\\4' || chr(1), 'g'), " +
      s"'(\\d)\\.(\\d)', '\\1' || chr(1) || '\\2', 'g'), " +
      s"'([.!?])([\"''’”)\\]]*)(\\s+)', '\\1\\2' || chr(2), 'g'), " +
      s"'([。！？])', '\\1' || chr(2), 'g'), " +
      s"chr(2)), s -> trim(replace(s, chr(1), '.'))), s -> len(s) > 0)"
  }
}
