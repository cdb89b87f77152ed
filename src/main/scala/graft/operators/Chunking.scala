package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the preprocessing step every
  * embedding/RAG/long-context training pipeline runs between raw documents
  * and an encoder with a fixed context window: split each document into
  * token windows of `chunkSize` with `overlap` tokens of context carried
  * across the seam.
  *
  * The reference has no analog (its unit is the whole column value); at
  * corpus scale this is the operator that multiplies row counts ~5-20x, so
  * its plan shape matters: tokenize -> window starts -> `posexplode` is one
  * NARROW projection per document (codegen'd builtins only, no UDF, no
  * shuffle) — chunk rows are born already distributed with their parents,
  * and whatever partitioning the corpus scan had is preserved.
  *
  * Window math: starts at 1, 1+stride, 1+2*stride, ... (stride =
  * chunkSize - overlap); a start is kept iff it is the first OR its
  * predecessor did not already reach the document's end (`s <= n -
  * chunkSize + stride`), so the final chunk may be short but never adds
  * zero new tokens. Every token belongs to >=1 chunk; consecutive chunks
  * share exactly `overlap` tokens except possibly the last.
  */
object Chunking {

  /** Truncate each document to a token budget on WORD boundaries — the
    * pre-tokenizer cut that keeps sequence assembly from mid-word splits.
    * Case and word bytes are preserved (whitespace runs normalize to one
    * space on the rejoin, stated contract); emits the kept-token count so
    * a pipeline can audit truncation loss. Narrow codegen'd builtins
    * (split/slice/concat_ws), no shuffle at any corpus size. */
  def truncateTokens(df: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val toks = split(trim(col(s"`$textCol`")), "\\s+")
    val kept = slice(toks, 1, maxTokens)
    df.where(col(s"`$textCol`").isNotNull)
      .select(
        col(s"`$idCol`").cast("long").as("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(kept).cast("long").as("n_kept"),
        concat_ws(" ", kept).as("text_trunc"))
  }

  /** Explode documents into (doc_id, chunk_idx, n_tokens, chunk_text) —
    * whitespace-token windows, deterministic and SQL-reproducible. Null
    * texts produce no chunks. */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks: Column = TextAnalysis.tokens(col(s"`$textCol`"))
    df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").cast("long").as("doc_id"), toks.as("t"))
      .withColumn("starts",
        filter(sequence(lit(1), size(col("t")), lit(stride)),
          s => s === 1 || s <= size(col("t")) - chunkSize + stride))
      .select(col("doc_id"),
        posexplode(transform(col("starts"), s => slice(col("t"), s, lit(chunkSize)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("n_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

  /** Deterministic fill-in-the-middle (FIM) transform — the code/infilling
    * pretraining rewrite: split each document at two cut points and emit
    * the PSM (prefix-suffix-middle) rearrangement
    * `<PRE>prefix<SUF>suffix<MID>middle`. Cut points come from the
    * engine-portable integer ring hash of the id (two independent draws),
    * NOT an RNG — the same document gets the same rewrite on every run,
    * any engine, any partitioning, so the transform composes with
    * dedup/decontamination instead of invalidating them. Character-based
    * cuts (tokenizer-agnostic, the rewrite happens before tokenization).
    * Null texts pass through as null rows; empty texts yield the bare
    * sentinel skeleton. One narrow codegen'd projection — no shuffle. */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
                   preTok: String = "<PRE>", sufTok: String = "<SUF>",
                   midTok: String = "<MID>"): DataFrame = {
    val len = length(col(s"`$textCol`"))
    // c1 uniform in [0, len]; c2 uniform in [c1, len] — both pure integer
    val h1 = Sampling.idHash(col(s"`$idCol`"))
    val h2 = Sampling.idHash(col(s"`$idCol`") + lit(7919L))
    // both hashes projected BEFORE the rename: referencing idCol after the
    // doc_id alias would fail analysis for any idCol not literally "doc_id"
    df.select(col(s"`$idCol`").cast("long").as("doc_id"),
        col(s"`$textCol`").as("__t"),
        pmod(h1, len.cast("long") + 1).cast("int").as("c1"),
        h2.as("__h2"))
      .withColumn("c2", (col("c1") + pmod(col("__h2"), length(col("__t")) - col("c1") + 1)).cast("int"))
      .select(col("doc_id"), col("c1").cast("long").as("c1"), col("c2").cast("long").as("c2"),
        when(col("__t").isNull, lit(null).cast("string")).otherwise(concat(
          lit(preTok), expr("substr(__t, 1, c1)"),
          lit(sufTok), expr("substr(__t, c2 + 1)"),
          lit(midTok), expr("substr(__t, c1 + 1, c2 - c1)"))).as("fim_text"))
  }
}
