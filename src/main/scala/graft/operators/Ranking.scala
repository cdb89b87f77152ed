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
    // null texts are excluded from the CORPUS STATS too: size(null) is
    // NULL, so sum(dl) would skip them while count(*) included them —
    // silently deflating avgdl and inflating n_docs in the idf
    val base = docs.where(col(s"`$textCol`").isNotNull)
      .select(id.as("doc_id"), toks.as("toks"))
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

  /** Windowed PMI co-occurrence mining — the corpus-statistics view of
    * word association (collocation discovery, tokenizer-merge evaluation,
    * topic drift monitoring): for every unordered token pair co-occurring
    * within `window` positions, `PMI = ln(p(x,y) / (p(x)·p(y)))`, top-k
    * by score.
    *
    * Scale shape: pair generation is a PER-DOCUMENT nested `transform`
    * over positions (narrow codegen, ≤ window·len pairs per doc) — never
    * a positions self-join of the corpus; pair counts aggregate with
    * map-side combine into a frame bounded by distinct co-occurring
    * pairs; corpus totals are 1-row broadcast constants; unigram counts
    * join back on the token hash; the final top-k is
    * TakeOrderedAndProject. Nothing globally sorts, the corpus text never
    * shuffles.
    *
    * Scores are `floor(pmi * 1e4 + 1e-6)` integers on exact-integer
    * inputs, the same cross-engine grid argument as [[bm25TopK]]; the
    * ratio is computed as `(c_xy/P)·(N/c_x)·(N/c_y)` — divisions first,
    * so no product leaves double's exact-integer range. Ties break by
    * (x, y) ascending. */
  def pmiTopK(df: DataFrame, textCol: String, window: Int,
              minCount: Long, k: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val toks = filter(TextAnalysis.tokens(col(s"`$textCol`")), w => length(w) > 0)
    val base = df.where(col(s"`$textCol`").isNotNull).select(toks.as("t"))
    val uni = base.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).cast("long").as("n_tok"))
    // sequence(1, size-1) would DESCEND for size 0 — guard with the filter
    val pairs = base.where(size(col("t")) >= 2)
      .select(explode(expr(
        s"flatten(transform(sequence(1, size(t) - 1), i -> " +
          s"transform(sequence(i + 1, least(i + $window, size(t))), j -> " +
          "struct(least(element_at(t, i), element_at(t, j)) AS x, " +
          "greatest(element_at(t, i), element_at(t, j)) AS y))))")).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val pcAll = pairs.groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
    // P re-aggregates the pair-count frame (distinct-pairs-sized), not the
    // raw pair stream — the exploded pairs are scanned exactly once
    val ptotal = pcAll.agg(sum(col("n_xy")).cast("long").as("n_pairs"))
    val pc = pcAll.where(col("n_xy") >= minCount)
    val cx = uni.select(col("w").as("x"), col("c").as("cx"))
    val cy = uni.select(col("w").as("y"), col("c").as("cy"))
    pc.join(cx, "x").join(cy, "y")
      .crossJoin(broadcast(ptotal)).crossJoin(broadcast(total))
      .withColumn("pmi_x1e4", floor(log(
        (col("n_xy").cast("double") / col("n_pairs")) *
          (col("n_tok").cast("double") / col("cx")) *
          (col("n_tok").cast("double") / col("cy"))) * 10000 + lit(1e-6)).cast("long"))
      .orderBy(col("pmi_x1e4").desc, col("x"), col("y")).limit(k)
      .select(col("x"), col("y"), col("n_xy"), col("pmi_x1e4"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    * standard hybrid-retrieval combiner: given R rankings of the same id
    * space (lexical BM25 ⊕ embedding ANN in a RAG stack, or any mix of
    * retrievers), score each id by `Σ_r 1/(k0 + rank_r)` and re-rank.
    * RRF needs only RANKS, never the retrievers' incomparable raw
    * scores, which is exactly why it is the default fusion in hybrid
    * search.
    *
    * Contribution arithmetic is `1e12 div (k0 + rank)` in pure Long —
    * exact, engine-portable, and order-independent under summation (the
    * float form's `Σ 1/(k0+r)` would be reduction-order-sensitive in the
    * last ulps). Ids absent from a ranking contribute 0 (the standard
    * convention); ties break toward the smaller id.
    *
    * Scale shape: each input ranking is top-k-sized by construction —
    * model-sized, not corpus-sized — so the union + id-keyed sum is one
    * bounded aggregate and the final order is TakeOrderedAndProject over
    * ≤ Σk rows. The expensive work happened in the retrievers. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String = "id", rankCol: String = "rank",
              k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 1, "k0 must be >= 1 (the standard damping constant is 60)")
    require(topK >= 1, "topK must be >= 1")
    val union = rankings.map(_.select(
        col(s"`$idCol`").cast("long").as("id"),
        expr(s"1000000000000 div (cast(`$rankCol` as bigint) + $k0)").as("__contrib")))
      .reduce(_ unionAll _)
    union.groupBy(col("id"))
      .agg(sum(col("__contrib")).cast("long").as("rrf_x1e12"),
        count(lit(1)).as("n_rankings"))
      .orderBy(col("rrf_x1e12").desc, col("id"))
      .limit(topK)
  }

  /** The nDCG position discounts on the ppm grid: `floor(1e6/log2(i+1))`
    * for ranks i = 1..k. Computed ONCE here (JVM doubles) and embedded as
    * plan/oracle LITERALS on both engines — the float log never crosses
    * an engine boundary, the shared constants do (the hard-negatives ppm
    * rule applied to a formula instead of a measurement). */
  def dcgDiscountsPpm(k: Int): Seq[Long] = {
    require(k >= 1 && k <= 100, "k in [1, 100] — the discounts become plan literals")
    (1 to k).map(i => math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)
  }

  /** The perfect-ordering DCG constant for [[evalRanking]]'s linear
    * gain: Σ_{i=1..k} (k+1−i)·disc(i). Exposed so oracles embed the
    * SAME constant instead of re-deriving the formula. */
  def idcgPpm(k: Int): Long = {
    val disc = dcgDiscountsPpm(k)
    (1 to k).map(i => (k + 1 - i).toLong * disc(i - 1)).sum
  }

  /** Retrieval-quality metrics of a `system` top-k ranking against a
    * graded `truth` top-k ranking, entirely on integer grids: relevance
    * of an id at truth rank t is `k+1-t` (linear gain; 0 when absent OR
    * past rank k), DCG = Σ rel·disc(srank) over [[dcgDiscountsPpm]]
    * (system rows past rank k discount to 0, like the oracle's `ELSE 0`
    * — so a top-20 system ranking evaluated at k=10 is well-defined,
    * never an ANSI array-index error), IDCG is [[idcgPpm]], nDCG and
    * MRR emerge as ppm integers via floor division. One row out:
    * (k, dcg, idcg, ndcg_ppm, mrr_ppm, n_relevant).
    *
    * Scale shape: both inputs are top-k-sized by construction (the
    * retrievers did the corpus work), so this is a broadcast join over
    * ≤ k rows and a single-row aggregate — evaluation is free at any
    * corpus size, which is why it belongs INSIDE the pipeline as a
    * regression gate rather than in a notebook. */
  def evalRanking(system: DataFrame, truth: DataFrame, k: Int,
                  idCol: String = "vid", rankCol: String = "rank"): DataFrame = {
    val disc = dcgDiscountsPpm(k)
    val idcg = idcgPpm(k)
    val s = system.select(col(s"`$idCol`").cast("long").as("__id"),
      col(s"`$rankCol`").cast("long").as("srank"))
    val t = truth.select(col(s"`$idCol`").cast("long").as("__id"),
      col(s"`$rankCol`").cast("long").as("trank"))
    s.join(broadcast(t), Seq("__id"), "left_outer")
      .select(col("srank"),
        // clamp BOTH edges: truth rows past rank k grade 0 (a raw
        // k+1-trank would go NEGATIVE and corrupt dcg), and system rows
        // past rank k carry rel 0 too, so n_relevant/MRR are @k metrics
        // (a hit at system rank 15 is not a top-10 hit); system rows past
        // rank k also discount to 0 (a raw element_at would throw
        // INVALID_ARRAY_INDEX under ANSI) — mirroring the oracle's CASE
        when(col("srank").between(1, k) &&
            col("trank").isNotNull && col("trank") <= k,
          lit(k.toLong + 1) - col("trank")).otherwise(lit(0L)).as("rel"),
        when(col("srank").between(1, k),
          element_at(typedlit(disc), col("srank").cast("int")))
          .otherwise(lit(0L)).as("disc"))
      .agg(
        coalesce(sum(col("rel") * col("disc")), lit(0L)).cast("long").as("dcg"),
        min(when(col("rel") > 0, col("srank"))).as("__fr"),
        count(when(col("rel") > 0, 1)).as("n_relevant"))
      .select(lit(k.toLong).as("k"), col("dcg"), lit(idcg).as("idcg"),
        expr(s"(dcg * 1000000) div $idcg").cast("long").as("ndcg_ppm"),
        coalesce(expr("1000000 div __fr"), lit(0L)).cast("long").as("mrr_ppm"),
        col("n_relevant"))
  }
}
