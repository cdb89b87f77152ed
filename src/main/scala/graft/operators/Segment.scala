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

  /** Per-word DP producing the token array (null when unsegmentable).
    * `bests(j)` = (cost, lastTokenLen) for prefix length j, computed by a
    * fold over j; the backtrack is a second fold walking lastTokenLen
    * pointers. Both are in-row expressions over the broadcast `vocab`
    * map literal. */
  private def viterbiToks(word: Column, vocab: Seq[String], maxWordLen: Int): Column = {
    val unreachable = 1 << 20 // sentinel cost; real costs are <= maxWordLen
    val vmap = typedlit(vocab.map(t => t -> 1).toMap)
    val len = length(word)
    val emptyBests = expr("CAST(array() AS ARRAY<STRUCT<c INT, l INT>>)")
    val bests = aggregate(
      sequence(lit(1), len),
      emptyBests,
      (acc, j) => {
        val cand = aggregate(
          sequence(lit(1), j),
          struct(lit(unreachable).as("c"), lit(0).as("l")),
          (best, l) => {
            val tok = word.substr(j - l + 1, l)
            val prevC = when(l === j, lit(0))
              .otherwise(element_at(acc, (j - l).cast("int")).getField("c"))
            val cost = prevC + 1
            // try_element_at: ANSI element_at THROWS on a missing map key
            val better = try_element_at(vmap, tok).isNotNull && prevC < unreachable &&
              (cost < best.getField("c") ||
                (cost === best.getField("c") && l > best.getField("l")))
            when(better, struct(cost.cast("int").as("c"), l.cast("int").as("l")))
              .otherwise(best)
          })
        concat(acc, array(cand))
      })
    // walk at most `len` pointer hops; st.j hits 0 exactly when done
    val walk = aggregate(
      sequence(lit(1), len),
      struct(len.cast("int").as("j"), expr("CAST(array() AS ARRAY<STRING>)").as("toks")),
      (st, _) => {
        val j = st.getField("j")
        val bl = element_at(bests, j).getField("l")
        when(j > 0,
          struct((j - bl).cast("int").as("j"),
            concat(array(word.substr(j - bl + 1, bl)), st.getField("toks")).as("toks")))
          .otherwise(st)
      })
    when(len.between(1, maxWordLen) &&
      element_at(bests, len.cast("int")).getField("c") < unreachable,
      walk.getField("toks"))
  }

  /** Segment every `[a-z]+` whitespace word of `textCol` optimally
    * against `vocab`: (id, pos, token) with `pos` the 1-based token
    * position in the document stream (unsegmentable words dropped,
    * positions contiguous over what remains — mirroring [[Bpe.encode]]'s
    * stream shape). */
  def viterbiSegment(df: DataFrame, idCol: String, textCol: String,
                     vocab: Seq[String], maxWordLen: Int = 20): DataFrame = {
    require(vocab.nonEmpty && vocab.size <= 1000000, "vocab must be non-empty and bounded")
    require(maxWordLen >= 1 && maxWordLen <= 64, "maxWordLen in [1, 64] — it squares in the DP")
    val words = df.select(posexplode(
      filter(split(trim(lower(col(s"`$textCol`"))), "\\s+"), w => w.rlike("^[a-z]+$")))
      .as(Seq("wpos", "word")))
      .where(length(col("word")) <= maxWordLen)
    val distinctWords = words.select(col("word")).distinct()
      .withColumn("toks", viterbiToks(col("word"), vocab, maxWordLen))
      .where(col("toks").isNotNull)
    val docWords = df.select(col(s"`$idCol`").as("id"), posexplode(
      filter(split(trim(lower(col(s"`$textCol`"))), "\\s+"), w => w.rlike("^[a-z]+$")))
      .as(Seq("wpos", "word")))
    docWords.join(distinctWords, Seq("word"))
      .select(col("id"), col("wpos"), posexplode(col("toks")).as(Seq("tpos", "token")))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("wpos"), col("tpos"))).cast("long"))
      .select(col("id").as(idCol), col("pos"), col("token"))
  }
}
