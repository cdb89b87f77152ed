package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimal (fewest-token) subword segmentation against a fixed vocabulary
  * — the Viterbi counterpart to [[Bpe.encode]]'s greedy merge replay.
  * Greedy BPE applies merges in training order and can emit more pieces
  * than the vocabulary requires; unigram-style tokenizers (SentencePiece)
  * instead pick the segmentation that OPTIMIZES a per-token objective
  * with dynamic programming. A float log-likelihood objective would break
  * cross-engine reproducibility, so this operator uses the integer
  * objective: minimize the token COUNT, breaking ties by preferring the
  * LONGEST final token at every DP cell (which makes the backtrack — and
  * therefore the emitted stream — a pure function of (word, vocab)).
  * Result: `tokens(viterbi) <= tokens(bpe-greedy)` per word, exactly.
  *
  * Scale shape, same as [[Bpe.encode]]: the corpus is never touched by
  * the DP — segmentation runs per DISTINCT word (one map-side-combined
  * distinct of bounded-length words), the vocabulary is a broadcast map
  * literal, and the per-word DP is an in-row higher-order-function fold
  * (O(maxWordLen²) literal-map probes). Documents re-acquire their token
  * streams through the distinct-word join-back. At 100 TB the DP cost is
  * |distinct words| — a vocabulary-shaped quantity — not corpus-shaped.
  *
  * Words longer than `maxWordLen` or containing characters outside the
  * vocabulary are UNSEGMENTABLE and are dropped from the output stream
  * (callers wanting an <unk> policy filter for the dropped ids against
  * the source). A vocabulary built from the same corpus (the
  * `segment_viterbi` query derives it from [[Bpe.train]]) always covers
  * every in-regex word's characters, so nothing drops there.
  */
object Segment {

  /** Per-word DP producing the token array (null when unsegmentable),
    * via the codegen'd [[graft.plans.ViterbiSegmentExpr]] kernel — a
    * first cut as nested higher-order array functions evaluated
    * INTERPRETED at ~80 ms per word (measured: 75 s over the sf0.1
    * distinct-word set); the flat-loop kernel does the same DP in
    * microseconds with the vocabulary riding the plan as a reference
    * object. */
  private def viterbiToks(word: Column, vocab: Seq[String], maxWordLen: Int): Column =
    org.apache.spark.sql.GraftBridge.column(graft.plans.ViterbiSegmentExpr(
      org.apache.spark.sql.GraftBridge.expression(word),
      new graft.plans.ViterbiKernel(vocab.distinct.toArray, maxWordLen)))

  /** Segment every word of `textCol` matching `wordPattern` (default
    * `[a-z]+`; pass [[Bpe.UnicodeWords]] for the `\p{L}` letter class a
    * multilingual corpus needs — RE2-compatible, so the oracle applies it
    * verbatim) optimally against `vocab`: (id, pos, token) with `pos`
    * the 1-based token position in the document stream (unsegmentable
    * words dropped, positions contiguous over what remains — mirroring
    * [[Bpe.encode]]'s stream shape). Every vocabulary token must itself
    * match the pattern — an out-of-alphabet token can never match any
    * word's substring under a character-class pattern, so shipping one
    * is a vocabulary/alphabet mismatch and fails loudly at build time.
    *
    * Fully IN-ROW: each document's word array runs through the kernel
    * inside a `transform` lambda, unsegmentable words drop via a null
    * filter, and positions come from the flattened array's own ordinality
    * — zero joins, zero shuffles, scan-bound at any corpus size. (The
    * first design segmented DISTINCT words and joined the stream back —
    * right when per-word work is expensive like BPE training, but with a
    * microsecond kernel the join-back's shuffle dominates: measured at
    * 100×, the distinct-word table outgrew the broadcast threshold and
    * the (doc, word) stream shuffled 3.4 GB that this layout simply never
    * moves.) */
  def viterbiSegment(df: DataFrame, idCol: String, textCol: String,
                     vocab: Seq[String], maxWordLen: Int = 20,
                     wordPattern: String = Bpe.AsciiWords): DataFrame = {
    require(vocab.nonEmpty && vocab.size <= 1000000, "vocab must be non-empty and bounded")
    require(maxWordLen >= 1 && maxWordLen <= 64, "maxWordLen in [1, 64] — it squares in the DP")
    val offAlphabet = vocab.filterNot(t => t.nonEmpty && t.matches(wordPattern))
    require(offAlphabet.isEmpty,
      s"vocabulary tokens outside the word alphabet $wordPattern can never match: " +
        offAlphabet.take(5).mkString("'", "', '", "'"))
    val words = filter(split(trim(lower(col(s"`$textCol`"))), "\\s+"), w => w.rlike(wordPattern))
    // per-word token arrays; the kernel returns null for unsegmentable or
    // over-length words and the filter drops them, keeping positions
    // contiguous over what remains
    val tokenStream = flatten(filter(
      transform(words, w => viterbiToks(w, vocab, maxWordLen)), a => a.isNotNull))
    df.select(col(s"`$idCol`").as(idCol), posexplode(tokenStream).as(Seq("__p", "token")))
      .select(col(s"`$idCol`"), (col("__p") + 1).cast("long").as("pos"), col("token"))
  }
}
