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
