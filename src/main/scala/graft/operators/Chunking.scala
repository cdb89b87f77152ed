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
}
