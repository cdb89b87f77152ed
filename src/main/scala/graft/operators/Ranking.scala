package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 full-text relevance ranking — retrieval over the corpus the way a
  * training-data curation pipeline scores documents against a probe query
  * (benchmark decontamination's cousin: find the documents most *like* a
  * target, rather than exact n-gram overlaps).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the per-document token explode is filtered to the query's terms
  *    BEFORE the aggregating shuffle, so the shuffle carries only postings
  *    for the handful of query terms — an index probe, not a corpus sort;
  *  - document frequencies and corpus stats are tiny aggregates that join
  *    back via broadcast (no second wide shuffle);
  *  - the final top-k is TakeOrderedAndProject, never a global sort.
  *
  * Scores are emitted as `floor(score * 1e4 + 1e-6)` integers: every input
  * to the formula is an exact integer (tf, dl, df, N — and avgdl is an
  * exact integer-sum divide), so cross-engine noise is confined to ~1-ULP
  * `ln` and summation-order differences (~1e-15 relative). The 1e-6 nudge
  * (advisor r7) keeps a score sitting within that noise of a 1e-4 grid
  * boundary from flooring differently across engines: 1e-6 is ~9 orders
  * above the noise and 100x below the grid, so it can only move a value
  * OFF a boundary, never across a genuine grid step.
  */
object Ranking {

  /** Top-k documents by BM25(queryTerms). Output: doc_id, dl, score_x1e4,
    * ordered by (score desc, doc_id) with ranks 1..k. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val id = col(s"`$idCol`")
    val toks = TextAnalysis.tokens(col(s"`$textCol`"))
    val base = docs.select(id.as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))

    // postings restricted to query terms before the shuffle
    val terms = array(queryTerms.map(lit): _*)
    val postings = base
      .select(col("doc_id"), col("dl"),
        explode(filter(col("toks"), t => array_contains(terms, t))).as("tok"))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))

    // corpus stats: N docs, avgdl (exact: integer sum / integer count)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))

    // per-term document frequency — at most queryTerms.size rows
    val dfreq = postings.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))

    val scored = postings
      .join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf").cast("double") * (k1 + 1.0) /
          (col("tf").cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy(col("doc_id"), col("dl"))
      .agg(floor(sum(col("contrib")) * 10000 + lit(1e-6)).cast("long").as("score_x1e4"))

    scored.orderBy(col("score_x1e4").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("dl"), col("score_x1e4"))
  }
}
