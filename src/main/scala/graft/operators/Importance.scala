package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via hashed-feature importance weights — the DSIR recipe
  * (Xie et al. 2023, arXiv:2302.03169): score every raw document by how
  * target-like its hashed token-feature distribution is, then keep the
  * top-weighted slice. The published method weights by the log-ratio of
  * target/raw bucket probabilities; this implementation uses the integer
  * per-bucket ratio `n_target(b) * 1e6 div n_raw(b)` summed over a
  * document's tokens — same monotone "does this doc's mass sit in
  * target-heavy buckets" signal, but exactly reproducible across engines
  * (floored integer arithmetic; a float log would make the top-k boundary
  * depend on summation order).
  *
  * The feature hash is deliberately ENGINE-PORTABLE: bucket(tok) =
  * (length(tok)*31 + ascii(first char)) mod nBuckets uses only functions
  * every SQL engine defines identically on ASCII text, so the DuckDB
  * oracle reproduces the buckets bit-for-bit. Hashed DSIR is insensitive
  * to the specific hash by design — any fixed surjection onto the bucket
  * space yields the same estimator family.
  *
  * Scale shape: one token explode (narrow), TWO tiny aggregates of
  * nBuckets rows each (the raw and target histograms — map-side combined,
  * then broadcast back as the ratio table), a broadcast join token→ratio,
  * and one groupBy(doc) sum. The corpus is never shuffled on anything
  * wider than the doc id, and the model (the ratio table) is nBuckets
  * integers — at 100 TB the target histogram comes from a sampled target
  * corpus and the whole "trained model" still fits in a closure.
  *
  * Null contract: NULL/empty text produces no tokens, so the document has
  * no score and never enters the selection — matching the paper, where a
  * featureless example has no importance weight.
  */
object Importance {

  /** Whitespace tokens of lower(trim(text)), empties removed. */
  private def toks(textCol: String): Column =
    filter(split(lower(trim(col(s"`$textCol`"))), "\\s+"), t => t =!= "")

  /** Engine-portable bucket id for one token (see class doc). */
  def bucketOf(tok: Column, nBuckets: Int): Column =
    pmod(length(tok) * 31 + ascii(tok), lit(nBuckets))

  /** (doc_id, score_x1e6, n_tokens) for the `k` highest-importance docs,
    * ordered score desc then id asc. `targetPred` marks the target corpus
    * rows (e.g. `col("lang") === "en"`). */
  def selectTopK(df: DataFrame, idCol: String, textCol: String, targetPred: Column,
                 nBuckets: Int = 64, k: Int = 20): DataFrame = {
    require(nBuckets > 0 && k > 0, "nBuckets and k must be positive")
    val tokens = Partitioning.spread(
      df.select(col(s"`$idCol`").cast("long").as("doc_id"),
        targetPred.as("is_target"), toks(textCol).as("ts")))
      .select(col("doc_id"), col("is_target"), explode(col("ts")).as("tok"))
      .select(col("doc_id"), col("is_target"), bucketOf(col("tok"), nBuckets).as("b"))

    // both histograms in ONE aggregate pass over the exploded tokens
    val hist = tokens.groupBy(col("b")).agg(
      count(lit(1)).as("n_raw"),
      count(when(col("is_target"), 1)).as("n_target"))
    // n_raw >= 1 by construction (a bucket only exists because some token
    // hashed into it), so the division is total; `div` keeps it on the
    // integer grid (Column./ would widen to double)
    val ratio = hist.select(col("b"),
      expr("(n_target * 1000000) div n_raw").as("r"))

    tokens.join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("r")).as("score_x1e6"), count(lit(1)).as("n_tokens"))
      .orderBy(col("score_x1e6").desc, col("doc_id").asc)
      .limit(k)
  }
}
