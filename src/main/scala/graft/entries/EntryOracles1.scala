package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.MaskTransform

/** DuckDB oracle SQL, part 1 of 2 (split from SparkEntry — r16 #6). */
private[graft] trait EntryOracles1 { this: EntryCore =>

  /** Frontier replay, shared VERBATIM by `sitemap_frontier` and its
    * streaming twin `stream_sitemap`. */
  private[graft] val sitemapFrontierOracleSql: String =
    ("WITH d AS (SELECT doc_id AS id FROM documents), " +
        "e AS (" +
        "SELECT 'url' AS kind, 'site' || (id % 20)::VARCHAR || '.com' AS domain, " +
        "'https://www.site' || (id % 20)::VARCHAR || '.com/page/' || id::VARCHAR || '?a=1&b=2' AS canon, " +
        "'2026-01-0' || (1 + id % 9)::VARCHAR AS lastmod FROM d WHERE id % 10 <> 0 " +
        "UNION ALL SELECT 'url', 'site' || (id % 20)::VARCHAR || '.com', " +
        "'https://www.site' || (id % 20)::VARCHAR || '.com/page/' || id::VARCHAR || '?a=1&b=2', NULL FROM d WHERE id % 10 <> 0 " +
        "UNION ALL SELECT 'url', 'other' || (id % 7)::VARCHAR || '.io', " +
        "'https://media.other' || (id % 7)::VARCHAR || '.io/x/' || id::VARCHAR, NULL FROM d WHERE id % 10 <> 0 " +
        "UNION ALL SELECT 'sitemap', 'site' || (id % 20)::VARCHAR || '.com', NULL, NULL FROM d WHERE id % 10 = 0 " +
        "UNION ALL SELECT 'sitemap', 'site' || (id % 20)::VARCHAR || '.com', NULL, NULL FROM d WHERE id % 10 = 0) " +
        "SELECT domain, count(CASE WHEN kind = 'url' THEN 1 END)::BIGINT AS n_urls, " +
        "count(DISTINCT canon)::BIGINT AS n_canonical, " +
        "least(count(DISTINCT canon), 40)::BIGINT AS n_kept, " +
        "count(CASE WHEN kind = 'url' THEN lastmod END)::BIGINT AS n_lastmod, " +
        "count(CASE WHEN kind = 'sitemap' THEN 1 END)::BIGINT AS n_children " +
        "FROM e GROUP BY domain ORDER BY domain")

  /** Novel set = the never-stored third, shared VERBATIM by
    * `frontier_incremental` and its streaming twin. */
  private[graft] val frontierNovelOracleSql: String =
    "WITH d AS (SELECT doc_id AS id FROM documents WHERE doc_id % 3 = 0) " +
      "SELECT 'front' || (id % 20)::VARCHAR || '.com' AS domain, " +
      "count(*)::BIGINT AS n_novel, sum(id)::BIGINT AS novel_id_sum " +
      "FROM d GROUP BY domain ORDER BY domain"

  private[graft] def oracleSqlPart1: Map[String, String] = Map(
    "ann_pq_topk" -> annPqOracleSql,
    "pq_recall" -> pqRecallOracleSql,
    "ranking_eval" -> rankingEvalOracleSql,
    "stream_cms" -> streamCmsOracleSql,
    "stream_hll" -> streamHllOracleSql,
    "stream_hll_window" -> streamHllWindowOracleSql,
    "stream_gram" -> streamGramOracleSql,
    // the streamed bottom-k must land on EXACTLY the batch sketch's state
    // — same oracle as quantile_bottomk, different plan under test
    "stream_quantile" -> quantileBottomkOracleSql,
    "sketch_shard_merge" -> sketchShardMergeOracleSql,
    "sketch_store_roundtrip" -> sketchStoreRoundtripOracleSql,
    "ann_ivfpq_topk" -> annIvfPqOracleSql,
    "ann_ivfpq_refine" -> annIvfPqRefineOracleSql,
    "ann_mmr_rerank" -> annMmrOracleSql,
    "dedup_winnow" -> dedupWinnowOracleSql,
    "sorted_neighborhood" -> sortedNeighborhoodOracleSql,
    "record_linkage" -> recordLinkageOracleSql,
    "fold_accents" -> foldAccentsOracleSql,
    "blocklist_phrases" -> blocklistPhrasesOracleSql,
    "cms_heavy_hitters" -> cmsHeavyHittersOracleSql,
    "hll_distinct" -> hllDistinctOracleSql,
    "hll_registers_only" -> hllRegistersOnlyOracleSql,
    "hll_group_distinct" -> hllGroupDistinctOracleSql,
    "hll_group_registers_only" -> hllGroupRegistersOnlyOracleSql,
    "cms_group_topk" -> cmsGroupTopkOracleSql,
    "hll_intersection" -> hllIntersectionOracleSql,
    "pca_project" -> pcaProjectOracleSql,
    "knn_graph" -> knnGraphOracleSql,
    "knn_graph_pruned" -> knnGraphPrunedOracleSql,
    "knn_graph_only" -> knnGraphOnlyOracleSql,
    "knn_clusters" -> knnClustersOracleSql,
    "knn_incremental" -> knnIncrementalOracleSql,
    // shared verbatim: streaming the probe must not change one edge
    "stream_knn_probe" -> knnIncrementalOracleSql,
    "gram_store_merge" -> gramStoreMergeOracleSql,
    "pca_drift" -> pcaDriftOracleSql,
    "pca_whiten" -> pcaWhitenOracleSql,
    "pca_by_group" -> pcaByGroupOracleSql,
    // the batch cell table must land on exactly the same 4096-cell state
    // as the streamed one — same oracle, different plan under test
    "cms_cells_only" -> streamCmsOracleSql,
    "quantile_bottomk" -> quantileBottomkOracleSql,
    "quantile_bottomk_merge" -> quantileBottomkMergeOracleSql,
    // KLL state is randomized and merge-order-dependent — no other engine
    // can replay it, so the oracle pins the CONTRACT the query verified
    // in-engine: exact total-weight conservation and the rank bound per
    // quantile (the vocab_cms pattern for engine-private sketch state)
    "quantile_kll" ->
      ("SELECT unnest([2500, 5000, 7500, 9900])::BIGINT AS q_x1e4, " +
        "(SELECT count(*) FROM documents WHERE text IS NOT NULL)::BIGINT AS n, " +
        "1::BIGINT AS weight_exact, 1::BIGINT AS within_bound ORDER BY q_x1e4"),
    "quantile_kll_merge" ->
      ("SELECT (SELECT count(*) FROM documents WHERE text IS NOT NULL)::BIGINT AS n, " +
        "1::BIGINT AS weight_exact, 4::BIGINT AS n_q, 4::BIGINT AS n_within"),
    // per-group KLL: same contract oracle per (lang, quantile) — the
    // rank-interval bound was verified in-engine against exact per-group
    // ranks; weight conservation throws in stateOf on any drift
    "group_quantile_kll" ->
      ("WITH g AS (SELECT lang, count(*)::BIGINT AS n FROM documents " +
        "WHERE text IS NOT NULL AND lang IS NOT NULL GROUP BY lang), " +
        "q AS (SELECT unnest([2500, 5000, 7500])::BIGINT AS q_x1e4) " +
        "SELECT lang, n, q_x1e4, 1::BIGINT AS within_bound FROM g, q " +
        "ORDER BY lang, q_x1e4"),
    "group_percentiles_portable" -> groupPercentilesPortableOracleSql,
    // the partitioned layout changes where bytes live, never the answer
    "ann_ivfpq_pruned" -> annIvfPqOracleSql,
    "ann_pq_batch" -> annPqBatchOracleSql,
    "dedup_pq_codes" -> pqCodePairsOracleSql,
    // reconstruction error vs the final codebook: per-(vec, subspace)
    // min distance over codes, summed, floor-mean aggregate
    "pq_error" ->
      (annPqCoreCte + ", " +
        "qe AS (SELECT vec_id, s, min(d) AS md FROM (" +
        "SELECT z.vec_id, z.s, cb.code, sum((z.q - cb.c) * (z.q - cb.c)) AS d " +
        "FROM qz z JOIN cb1 cb ON cb.s = z.s AND cb.spos = z.spos " +
        "GROUP BY z.vec_id, z.s, cb.code) GROUP BY vec_id, s), " +
        "te AS (SELECT vec_id, sum(md) AS e FROM qe GROUP BY vec_id) " +
        "SELECT count(*)::BIGINT AS n_vectors, sum(e)::BIGINT AS total_err, " +
        "((sum(e) - ((sum(e) % count(*)) + count(*)) % count(*)) // count(*))::BIGINT AS mean_err FROM te"),
    // batch PQ replay aggregated over every streamed vector
    "stream_pq_probe" ->
      (annPqCoreCte + " SELECT count(*)::BIGINT AS n, sum(pq_dist)::BIGINT AS dist_sum, " +
        "min(pq_dist)::BIGINT AS dist_min, max(pq_dist)::BIGINT AS dist_max, " +
        "sum(vec_id)::BIGINT AS id_sum FROM res"),
    "segment_viterbi" -> segmentViterbiOracleSql,
    // shared verbatim: streaming the segmentation must not change a token
    "stream_segment" -> segmentViterbiOracleSql,
    "unigram_train" -> unigramTrainOracleSql,
    "tokenizer_eval" -> tokenizerEvalOracleSql,
    // the same replays over the planted multilingual VALUES rows with the
    // \p{L} alphabet — accents survive training and segmentation
    "bpe_train_unicode" ->
      (s"WITH RECURSIVE ${bpeTrainCteFor(unicodeValuesSql, "\\p{L}+", 10)} " +
        "SELECT rank, a AS lhs, b AS rhs, n FROM merges ORDER BY rank"),
    "segment_viterbi_unicode" ->
      segmentViterbiOracleSqlFor(unicodeValuesSql, "\\p{L}+", 10),
    // brute-force integer L2 on the same 1e6 grid
    "ann_l2_topk" ->
      ("WITH qz AS (SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos, " +
        "unnest(list_transform(embedding, e -> round(e::DOUBLE * 1000000)::BIGINT)) AS q FROM embeddings), " +
        "qv AS (SELECT pos, q FROM qz WHERE vec_id = 0), " +
        "d AS (SELECT z.vec_id, sum((z.q - qv.q) * (z.q - qv.q))::BIGINT AS l2_dist " +
        "FROM qz z JOIN qv ON qv.pos = z.pos WHERE z.vec_id <> 0 GROUP BY z.vec_id) " +
        "SELECT vec_id, l2_dist, row_number() OVER (ORDER BY l2_dist, vec_id) AS rank " +
        "FROM d ORDER BY l2_dist, vec_id LIMIT 10"),
    // per-probe different-label cosine ranking on the ppm grid (a 1e-15
    // cross-engine float difference can flip an exact-float rank on a
    // near-tie but not a 1e-6 grid cell), cut at k=3
    "hard_negatives" ->
      ("WITH p AS (SELECT vec_id AS probe_id, list_transform(embedding, x -> x::DOUBLE) AS pe, " +
        "label AS pl FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)), " +
        "s AS (SELECT p.probe_id, e.vec_id, " +
        "round(list_cosine_similarity(list_transform(e.embedding, x -> x::DOUBLE), p.pe) * 1000000)::BIGINT AS cos_ppm " +
        "FROM embeddings e JOIN p ON e.label <> p.pl), " +
        "r AS (SELECT probe_id, vec_id, cos_ppm, row_number() OVER (PARTITION BY probe_id " +
        "ORDER BY cos_ppm DESC, vec_id) AS rank FROM s) " +
        "SELECT probe_id::BIGINT AS probe_id, vec_id::BIGINT AS vec_id, cos_ppm, rank::BIGINT AS rank " +
        "FROM r WHERE rank <= 3 ORDER BY probe_id, rank"),
    // SemDeDup drop set recomputed with double-cast cosines in SQL
    "semantic_dedup" ->
      ("WITH d AS (SELECT DISTINCT b.vec_id AS vid FROM embeddings a JOIN embeddings b " +
        "ON a.label = b.label AND a.vec_id < b.vec_id " +
        "AND list_cosine_similarity(list_transform(a.embedding, x -> x::DOUBLE), " +
        "list_transform(b.embedding, x -> x::DOUBLE)) >= 0.30) " +
        "SELECT (SELECT count(*) FROM embeddings)::BIGINT AS n_vectors, " +
        "(SELECT count(*) FROM d)::BIGINT AS n_dropped, " +
        "(SELECT coalesce(sum(vid), 0) FROM d)::BIGINT AS dropped_id_sum, " +
        "(SELECT count(*) FROM embeddings WHERE vec_id NOT IN (SELECT vid FROM d))::BIGINT AS n_kept, " +
        "(SELECT coalesce(sum(vec_id), 0) FROM embeddings WHERE vec_id NOT IN (SELECT vid FROM d))::BIGINT AS kept_id_sum"),
    "pagerank" -> pagerankOracleSql,
    "pagerank_incremental" -> pagerankIncrementalOracleSql,
    "label_prop" -> labelPropOracleSql,
    "kcore_peel" -> kcoreOracleSql,
    // BM25 top-20 and cosine top-20 replayed, fused by the same integer
    // 1e12 div (rank + 60) contributions
    "hybrid_rrf" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "dl AS (SELECT doc_id, len(t)::BIGINT AS dl FROM toks), " +
        "st AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM dl), " +
        "p AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM " +
        "(SELECT doc_id, unnest(t) AS tok FROM toks) " +
        "WHERE tok IN ('hash', 'join', 'window', 'stream') GROUP BY doc_id, tok), " +
        "f AS (SELECT tok, count(*)::DOUBLE AS df FROM p GROUP BY tok), " +
        "sc AS (SELECT p.doc_id, floor(sum(" +
        "ln(1.0 + (st.n - f.df + 0.5) / (f.df + 0.5)) * p.tf::DOUBLE * (1.2 + 1.0) / " +
        "(p.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * d.dl::DOUBLE / st.avgdl))" +
        ") * 10000 + 0.000001)::BIGINT AS score_x1e4 " +
        "FROM p JOIN f USING (tok) JOIN dl d USING (doc_id) CROSS JOIN st GROUP BY p.doc_id, d.dl), " +
        "lex AS (SELECT doc_id AS id, row_number() OVER (ORDER BY score_x1e4 DESC, doc_id) AS rank " +
        "FROM sc ORDER BY score_x1e4 DESC, doc_id LIMIT 20), " +
        "qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), " +
        "sem AS (SELECT vec_id AS id, row_number() OVER (ORDER BY list_cosine_similarity(embedding, qe) DESC, vec_id) AS rank " +
        "FROM embeddings, qv WHERE vec_id <> 0 " +
        "ORDER BY list_cosine_similarity(embedding, qe) DESC, vec_id LIMIT 20), " +
        "u AS (SELECT id, 1000000000000 // (rank + 60) AS contrib FROM lex " +
        "UNION ALL SELECT id, 1000000000000 // (rank + 60) FROM sem) " +
        "SELECT id::BIGINT AS id, sum(contrib)::BIGINT AS rrf_x1e12, count(*)::BIGINT AS n_rankings " +
        "FROM u GROUP BY id ORDER BY rrf_x1e12 DESC, id LIMIT 10"),
    "community_modularity" -> modularityOracleSql,
    // exact integer sqrt (float floor(sqrt) with the +-1 correction),
    // floor quotas over the isqrt weight total
    "lang_mix_report" ->
      (langMixQuotaCte +
        "SELECT lang, n_docs, w, quota FROM q ORDER BY lang"),
    // ring-hash window replay of the bounded-heap sample, cut at quota
    "lang_mix_sample" ->
      (langMixQuotaCte + ", " +
        "r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang " +
        "ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296, doc_id) AS rank " +
        "FROM documents WHERE lang IS NOT NULL AND doc_id IS NOT NULL) " +
        "SELECT r.lang, r.doc_id::BIGINT AS doc_id, r.rank::BIGINT AS rank " +
        "FROM r JOIN q USING (lang) WHERE r.rank <= q.quota ORDER BY lang, rank"),
    // every structural rule recomputed in integer cross-multiplication
    "quality_rules" ->
      (qualityRulesCte +
        "SELECT doc_id, n_words, n_lines, word_count_ok, mean_word_len_ok, symbol_ok, " +
        "bullet_ok, ellipsis_ok, alpha_ok, stopword_ok, pass FROM g ORDER BY doc_id"),
    // power-of-2 half-life decay replayed in integers: floor-second ages,
    // 7-day buckets, weight 2^(30 - bucket), cents-grid values
    "recency_weights" ->
      ("WITH e AS (SELECT user_id, " +
        "((1706745600 - floor(epoch(ts))::BIGINT) // 86400) // 7 AS bucket, " +
        "round(value * 100)::BIGINT AS cents FROM events " +
        "WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL), " +
        "w AS (SELECT user_id, cents, " +
        "CASE WHEN bucket <= 30 THEN (1::BIGINT << (30 - bucket)::INT) ELSE 0 END AS w FROM e) " +
        "SELECT user_id, count(*)::BIGINT AS n_events, sum(w)::BIGINT AS w_sum, " +
        "sum(cents * w)::BIGINT AS decayed_cents FROM w GROUP BY user_id ORDER BY user_id"),
    // one-row dataset card: volume, token mass, spread, quality pass
    // rate, exact-dup mass, top language (ties to smallest code)
    "corpus_card" ->
      (qualityRulesCte +
        ", base AS (SELECT count(*)::BIGINT AS n_docs, " +
        "sum(len(string_split_regex(lower(trim(text)), '\\s+')))::BIGINT AS n_tokens, " +
        "count(DISTINCT source)::BIGINT AS n_sources, " +
        "count(DISTINCT lang)::BIGINT AS n_langs, " +
        "count(DISTINCT md5(lower(trim(text))))::BIGINT AS n_distinct_texts, " +
        "sum(n_chars)::BIGINT AS n_chars FROM documents), " +
        "qp AS (SELECT sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS n_quality_pass FROM g), " +
        "tl AS (SELECT lang AS top_lang, count(*)::BIGINT AS top_lang_docs FROM documents " +
        "WHERE lang IS NOT NULL GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1) " +
        "SELECT n_docs, n_tokens, n_chars, n_sources, n_langs, " +
        "(n_docs - n_distinct_texts)::BIGINT AS n_exact_dup_docs, n_quality_pass, " +
        "top_lang, top_lang_docs FROM base, qp, tl"),
    // streaming twin: the stateless rules aggregate identically over the
    // one-shot stream
    "stream_quality_filter" ->
      (qualityRulesCte +
        "SELECT count(*)::BIGINT AS n_docs, " +
        "sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS n_pass, " +
        "sum(CASE WHEN bullet_ok THEN 1 ELSE 0 END)::BIGINT AS n_bullet_ok, " +
        "sum(CASE WHEN alpha_ok THEN 1 ELSE 0 END)::BIGINT AS n_alpha_ok, " +
        "sum(CASE WHEN stopword_ok THEN 1 ELSE 0 END)::BIGINT AS n_stopword_ok, " +
        "sum(CASE WHEN pass THEN doc_id ELSE 0 END)::BIGINT AS pass_id_sum FROM g"),
    // smallest-capacity bucket assignment + integral padding arithmetic
    "padding_report" ->
      ("WITH t AS (SELECT len(string_split_regex(lower(trim(text)), '\\s+'))::BIGINT AS toks FROM documents), " +
        "b AS (SELECT toks, coalesce(list_filter([16,32,64,128,256,512,1024,2048,4096], c -> c >= toks)[1], -1)::BIGINT AS bucket_capacity " +
        "FROM t WHERE toks IS NOT NULL AND toks > 0), " +
        "g AS (SELECT bucket_capacity, count(*)::BIGINT AS n_docs, sum(toks)::BIGINT AS token_sum FROM b GROUP BY bucket_capacity) " +
        "SELECT bucket_capacity, n_docs, token_sum, " +
        "(CASE WHEN bucket_capacity > 0 THEN bucket_capacity * n_docs - token_sum ELSE 0 END)::BIGINT AS padded_tokens, " +
        "(CASE WHEN bucket_capacity > 0 THEN ((bucket_capacity * n_docs - token_sum) * 1000000) // (bucket_capacity * n_docs) ELSE 0 END)::BIGINT AS waste_ppm " +
        "FROM g ORDER BY bucket_capacity"),
    // per-source cap winners recomputed as a (hash, id) window rank
    "cap_per_group" ->
      ("WITH h AS (SELECT source, doc_id, n_chars, " +
        "row_number() OVER (PARTITION BY source " +
        "ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296, doc_id) AS rn FROM documents) " +
        "SELECT source, count(*)::BIGINT AS n_kept, sum(doc_id)::BIGINT AS id_sum, " +
        "sum(n_chars)::BIGINT AS chars_sum FROM h WHERE rn <= 25 " +
        "GROUP BY source ORDER BY source"),
    // ring-hash prefix fill replayed: running token sum in (hash, id)
    // order, keep while the PRECEDING sum is under the budget
    "cap_tokens_per_group" ->
      ("WITH t AS (SELECT source, doc_id, " +
        "len(string_split_regex(lower(trim(text)), '\\s+'))::BIGINT AS toks " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL AND doc_id IS NOT NULL), " +
        "h AS (SELECT source, doc_id, toks, coalesce(sum(toks) OVER (" +
        "PARTITION BY source ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM t) " +
        "SELECT source, count(*)::BIGINT AS n_kept, sum(toks)::BIGINT AS tokens_kept, " +
        "sum(doc_id)::BIGINT AS id_sum FROM h WHERE cb < 400 GROUP BY source ORDER BY source"),
    // CMS inner product replayed cell-for-cell: same md5-slice cells,
    // same per-row dots, same min-with-zero-reindex, exact truths and
    // integer bound arithmetic
    "cms_join_size" ->
      ("WITH lp AS (SELECT l_partkey::VARCHAR AS k FROM lineitem), " +
        "lo AS (SELECT l_orderkey::VARCHAR AS k FROM lineitem), " +
        "oo AS (SELECT o_orderkey::VARCHAR AS k FROM orders), " +
        "rr AS (SELECT unnest([0, 1, 2, 3]) AS r), " +
        "clp AS (SELECT r, ('0x' || substr(md5(k), 1 + 3 * r, 3))::UBIGINT::BIGINT % 4096 AS c, count(*)::BIGINT AS cnt FROM lp, rr GROUP BY 1, 2), " +
        "clo AS (SELECT r, ('0x' || substr(md5(k), 1 + 3 * r, 3))::UBIGINT::BIGINT % 4096 AS c, count(*)::BIGINT AS cnt FROM lo, rr GROUP BY 1, 2), " +
        "coo AS (SELECT r, ('0x' || substr(md5(k), 1 + 3 * r, 3))::UBIGINT::BIGINT % 4096 AS c, count(*)::BIGINT AS cnt FROM oo, rr GROUP BY 1, 2), " +
        "dself AS (SELECT a.r, sum(a.cnt * b.cnt)::BIGINT AS dot FROM clp a JOIN clp b ON a.r = b.r AND a.c = b.c GROUP BY a.r), " +
        "dol AS (SELECT a.r, sum(a.cnt * b.cnt)::BIGINT AS dot FROM clo a JOIN coo b ON a.r = b.r AND a.c = b.c GROUP BY a.r), " +
        "eself AS (SELECT sum(c * c)::BIGINT AS exact_self, sum(c)::BIGINT AS n FROM (SELECT count(*)::BIGINT AS c FROM lp GROUP BY k)), " +
        "eol AS (SELECT coalesce(sum(a.ca * b.cb), 0)::BIGINT AS exact_ol FROM " +
        "(SELECT k, count(*)::BIGINT AS ca FROM lo GROUP BY k) a JOIN (SELECT k, count(*)::BIGINT AS cb FROM oo GROUP BY k) b ON a.k = b.k), " +
        "nord AS (SELECT count(*)::BIGINT AS n_ord FROM oo), " +
        "e1 AS (SELECT min(coalesce(dot, 0))::BIGINT AS est_self FROM rr LEFT JOIN dself USING (r)), " +
        "e2 AS (SELECT min(coalesce(dot, 0))::BIGINT AS est_ol FROM rr LEFT JOIN dol USING (r)) " +
        "SELECT est_self, exact_self, " +
        "(CASE WHEN est_self >= exact_self THEN 1 ELSE 0 END)::BIGINT AS self_ge_ok, " +
        "(CASE WHEN est_self <= exact_self + (3 * n * n) // 4096 THEN 1 ELSE 0 END)::BIGINT AS self_bound_ok, " +
        "est_ol, exact_ol, " +
        "(CASE WHEN est_ol >= exact_ol THEN 1 ELSE 0 END)::BIGINT AS ol_ge_ok, " +
        "(CASE WHEN est_ol <= exact_ol + (3 * n * n_ord) // 4096 THEN 1 ELSE 0 END)::BIGINT AS ol_bound_ok " +
        "FROM e1, e2, eself, eol, nord"),
    // doubled-integer-grid MAD rule, full recompute
    "anomaly_mad" ->
      ("WITH c AS (SELECT event_type, round(value * 100)::BIGINT AS cents FROM events), " +
        "m AS (SELECT event_type, round(quantile_cont(cents, 0.5) * 2)::BIGINT AS med2 " +
        "FROM c WHERE cents IS NOT NULL GROUP BY event_type), " +
        "d AS (SELECT c.event_type, cents, med2, abs(2 * cents - med2) AS dev2 " +
        "FROM c LEFT JOIN m USING (event_type)), " +
        "md AS (SELECT event_type, round(quantile_cont(dev2, 0.5) * 2)::BIGINT AS mad4 " +
        "FROM d WHERE dev2 IS NOT NULL GROUP BY event_type), " +
        "f AS (SELECT d.event_type, cents, med2, mad4, " +
        "CASE WHEN cents IS NULL OR mad4 IS NULL THEN 0 " +
        "WHEN 2 * dev2 > 3 * mad4 THEN 1 ELSE 0 END AS flagged " +
        "FROM d LEFT JOIN md USING (event_type)) " +
        "SELECT event_type, count(*)::BIGINT AS n, max(med2)::BIGINT AS med2, " +
        "max(mad4)::BIGINT AS mad4, sum(flagged)::BIGINT AS n_flagged, " +
        "coalesce(sum(CASE WHEN flagged = 1 THEN cents END), 0)::BIGINT AS flagged_cent_sum " +
        "FROM f GROUP BY event_type ORDER BY event_type"),
    // whole-word blocklist hits after the same punctuation strip
    "blocklist_filter" ->
      ("WITH t AS (SELECT source, doc_id, " +
        "len(list_filter(list_transform(string_split_regex(lower(trim(text)), '\\s+'), " +
        "t -> regexp_replace(regexp_replace(t, '^[^a-z0-9]+', ''), '[^a-z0-9]+$', '')), " +
        "t -> list_contains(['dup', 'spark', 'vector'], t)))::BIGINT AS hits FROM documents) " +
        "SELECT source, count(*)::BIGINT AS n_docs, " +
        "sum((hits > 0)::BIGINT)::BIGINT AS n_flagged, sum(hits)::BIGINT AS hit_sum, " +
        "coalesce(sum(CASE WHEN hits > 0 THEN doc_id END), 0)::BIGINT AS flagged_id_sum " +
        "FROM t GROUP BY source ORDER BY source"),
    // per-doc distinct-8-gram overlap share vs the planted benchmark
    "contamination_ratio" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), " +
        "g0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 8 + 2), i -> array_to_string(toks[i:i+7], ' '))) AS gram " +
        "FROM t WHERE len(toks) >= 8), " +
        "g AS (SELECT DISTINCT doc_id, gram FROM g0), " +
        "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0), " +
        "j AS (SELECT g.doc_id, count(*)::BIGINT AS n_grams, count(b.gram)::BIGINT AS n_hit " +
        "FROM g LEFT JOIN bench b ON g.gram = b.gram GROUP BY g.doc_id) " +
        "SELECT doc_id, n_grams, n_hit, (n_hit * 10000 // n_grams)::BIGINT AS ratio_x1e4 " +
        "FROM j ORDER BY doc_id"),
    // percent_rank (min-rank ties) replayed as a window; same per-10k grid
    "score_calibrate" ->
      ("WITH r AS (SELECT doc_id, source, n_chars::BIGINT AS n_chars, " +
        "rank() OVER (PARTITION BY source ORDER BY n_chars) AS rnk, " +
        "count(*) OVER (PARTITION BY source) AS n FROM documents) " +
        "SELECT doc_id, source, n_chars, " +
        "(CASE WHEN n > 1 THEN ((rnk - 1) * 10000) // (n - 1) ELSE 0 END)::BIGINT AS pr_x1e4 " +
        "FROM r ORDER BY doc_id"),
    // exact-Jaccard pair set (as dedup_minhash) rolled up by source pair
    "dedup_cross_source" ->
      ("WITH sh AS (SELECT doc_id, list_distinct([text[i:i+4] FOR i IN range(1, greatest(len(text)-3, 1))]) AS s FROM documents), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.s, b.s))::DOUBLE / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id), " +
        "pr AS (SELECT id_a, id_b FROM p WHERE j >= 0.8), " +
        "s AS (SELECT pr.id_a, pr.id_b, da.source AS sa, db.source AS sb FROM pr " +
        "JOIN documents da ON pr.id_a = da.doc_id JOIN documents db ON pr.id_b = db.doc_id) " +
        "SELECT least(sa, sb) AS src_lo, greatest(sa, sb) AS src_hi, " +
        "count(*)::BIGINT AS n_pairs, sum(id_a + id_b)::BIGINT AS pair_id_sum " +
        "FROM s GROUP BY 1, 2 ORDER BY 1, 2"),
    // independent public-suffix replay: host extraction by regex, then the
    // PSL algorithm itself (candidate-suffix expansion, rule-table longest
    // match, exception > wildcard > normal > default '*') over the rule
    // subset reachable by the planted hosts — not a copy of the URL
    // construction
    "url_domain_report" ->
      ("WITH u AS (SELECT CASE " +
        "WHEN c_custkey % 12 = 0 THEN concat('https://shop', (c_custkey % 97)::VARCHAR, '.example.com/products?id=', c_custkey::VARCHAR) " +
        "WHEN c_custkey % 12 = 1 THEN concat('http://user@www', (c_custkey % 13)::VARCHAR, '.webmail.co.uk:8080/inbox') " +
        "WHEN c_custkey % 12 = 2 THEN concat('media', (c_custkey % 7)::VARCHAR, '.cdn.ac.uk') " +
        "WHEN c_custkey % 12 = 3 THEN concat('https://192.168.', (c_custkey % 256)::VARCHAR, '.', (c_custkey % 250)::VARCHAR, '/admin') " +
        "WHEN c_custkey % 12 = 4 THEN concat('https://news.site', (c_custkey % 11)::VARCHAR, '.com.au/a') " +
        "WHEN c_custkey % 12 = 5 THEN 'ftp://files.archive.org:21/pub' " +
        "WHEN c_custkey % 12 = 6 THEN 'https://www.gov.ck/services' " +
        "WHEN c_custkey % 12 = 7 THEN 'https://www.ck/index' " +
        "WHEN c_custkey % 12 = 8 THEN 'http://localhost:3000/dev' " +
        "WHEN c_custkey % 12 = 9 THEN concat('https://api.v', (c_custkey % 3)::VARCHAR, '.app', (c_custkey % 19)::VARCHAR, '.io/v1/q') " +
        "WHEN c_custkey % 12 = 10 THEN concat('//assets.tienda', (c_custkey % 23)::VARCHAR, '.com.mx/img.png') " +
        "ELSE concat('dash.metrics', (c_custkey % 5)::VARCHAR, '.example.co.jp.') END AS url FROM customer), " +
        "h AS (SELECT url, rtrim(lower(regexp_extract(regexp_replace(url, '^//', ''), " +
        "'^(?:[a-z][a-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]*)', 1)), '.') AS host FROM u), " +
        "hl AS (SELECT host, string_split(host, '.') AS ls, len(string_split(host, '.')) AS nl " +
        "FROM (SELECT DISTINCT host FROM h)), " +
        "c2 AS (SELECT host, nl, ls, unnest(generate_series(1, nl)) AS i FROM hl), " +
        "c3 AS (SELECT host, nl, i, array_to_string(ls[i:], '.') AS cand, " +
        "CASE WHEN i < nl THEN array_to_string(ls[i+1:], '.') END AS tail FROM c2), " +
        "m AS (SELECT host, nl, " +
        "min(CASE WHEN cand IN ('www.ck') THEN i END) AS exc_i, " +
        "min(CASE WHEN cand IN ('com','org','io','uk','co.uk','ac.uk','au','com.au','mx','com.mx','jp','co.jp') THEN i END) AS norm_i, " +
        "min(CASE WHEN tail IN ('ck') THEN i END) AS wild_i FROM c3 GROUP BY host, nl), " +
        "ps AS (SELECT host, CASE WHEN exc_i IS NOT NULL THEN exc_i + 1 " +
        "WHEN norm_i IS NOT NULL OR wild_i IS NOT NULL THEN least(coalesce(norm_i, 9999), coalesce(wild_i, 9999)) " +
        "ELSE nl END AS s FROM m), " +
        "dm AS (SELECT hl.host, CASE " +
        "WHEN regexp_matches(hl.host, '^[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}$') THEN NULL " +
        "WHEN hl.nl < 2 THEN NULL " +
        "WHEN ps.s >= 2 THEN array_to_string(hl.ls[ps.s - 1:], '.') END AS domain " +
        "FROM ps JOIN hl ON hl.host = ps.host), " +
        "r AS (SELECT h.url, h.host, dm.domain FROM h JOIN dm ON dm.host = h.host) " +
        "SELECT domain, count(*)::BIGINT AS n_urls, count(DISTINCT host)::BIGINT AS n_hosts, " +
        "((count(*) * 1000000) // (SELECT count(*) FROM r))::BIGINT AS share_ppm " +
        "FROM r GROUP BY domain ORDER BY n_urls DESC, domain"),
    // ground truth from the planted construction: 4 records per doc,
    // 2 responses, 1 kept 200; body = 'warc body for doc <id> ' plus
    // (id%7)+1 space-joined 'w's, so body length = 18 + len(id) + 1 +
    // (2*((id%7)+1) - 1); the engine's container/HTTP machinery must
    // reproduce it byte-for-byte (n_body_match pins to n)
    "warc_ingest" ->
      ("WITH d AS (SELECT doc_id AS id FROM documents), " +
        "b AS (SELECT id, 19 + len(id::VARCHAR) + 2 * ((id % 7) + 1) - 1 AS blen FROM d) " +
        "SELECT count(*)::BIGINT AS n_files, (count(*) * 4)::BIGINT AS n_records, " +
        "(count(*) * 2)::BIGINT AS n_responses, count(*)::BIGINT AS n_ok200, " +
        "sum(blen)::BIGINT AS body_chars, count(*)::BIGINT AS n_body_match FROM b"),
    // charset-ladder replay: the expected DECODED strings are DuckDB
    // constants per planted arm (the 1252/Shift-of-meaning bytes live
    // only on the engine side — the oracle states what correct decoding
    // must produce), the charset per arm is the ladder's pinned pick
    "warc_charset" ->
      ("WITH d AS (SELECT doc_id, doc_id % 5 AS case_id FROM documents), " +
        "e AS (SELECT case_id, CASE case_id " +
        "WHEN 0 THEN 'plain ascii doc ' || doc_id::VARCHAR " +
        "WHEN 1 THEN 'résumé détails ' || doc_id::VARCHAR " +
        "WHEN 2 THEN 'café ' || doc_id::VARCHAR " +
        "WHEN 3 THEN '<html><head><meta charset=\"windows-1252\"></head><body>déjà vu ' || doc_id::VARCHAR || '</body></html>' " +
        "ELSE 'naïve fiancée ' || doc_id::VARCHAR END AS exp FROM d) " +
        "SELECT case_id, count(*)::BIGINT AS n_docs, " +
        "CASE WHEN case_id IN (0, 2) THEN 'UTF-8' ELSE 'windows-1252' END AS charset, " +
        "1::BIGINT AS n_charsets, count(*)::BIGINT AS n_decoded_exact, " +
        "sum(len(exp))::BIGINT AS decoded_chars FROM e GROUP BY case_id ORDER BY case_id"),
    // decode->langid replay: per-arm charset, language, exact decoded
    // bodies and char mass are construction constants (the zh arm is
    // reachable only if the GBK declaration was honored — 1252 mojibake
    // has no CJK codepoints for the script detector)
    "crawl_langid" ->
      ("WITH d AS (SELECT doc_id AS id, doc_id % 5 AS c FROM documents), " +
        "e AS (SELECT c, CASE c " +
        "WHEN 0 THEN 'the report and the data of the crawl is here to stay with us number ' || id::VARCHAR " +
        "WHEN 1 THEN '你好世界这是一个测试的报告编号 ' || id::VARCHAR " +
        "WHEN 2 THEN 'le chat est dans la maison et les champs pour une vie très belle ' || id::VARCHAR " +
        "WHEN 3 THEN 'これは日本語のページでありクロールの報告を含んでいます番号 ' || id::VARCHAR " +
        "ELSE '이것은 한국어 시험 보고서입니다 번호 ' || id::VARCHAR END AS exp FROM d) " +
        "SELECT c AS case_id, count(*)::BIGINT AS n_docs, " +
        "CASE c WHEN 0 THEN 'UTF-8' WHEN 1 THEN 'GBK' WHEN 2 THEN 'windows-1252' " +
        "WHEN 3 THEN 'Shift_JIS' ELSE 'EUC-KR' END AS charset, " +
        "CASE c WHEN 0 THEN 'en' WHEN 1 THEN 'zh' WHEN 2 THEN 'fr' " +
        "WHEN 3 THEN 'ja' ELSE 'ko' END AS lang, " +
        "1::BIGINT AS n_langs, count(*)::BIGINT AS n_exact, " +
        "sum(len(exp))::BIGINT AS body_chars FROM e GROUP BY c ORDER BY case_id"),
    // redirect/revisit replay: every chain is 2 hops of id arithmetic
    // (/a/id -> /b/id -> final p/(id%20)), every 10th id adds a 2-url
    // loop that must land unresolved at the hop cap, and each id's
    // revisit record points at its final capture — so every count is a
    // closed form over the id set
    "warc_redirects" ->
      ("WITH d AS (SELECT doc_id AS id FROM documents), " +
        "a AS (SELECT count(*)::BIGINT AS n, " +
        "count(*) FILTER (WHERE id % 10 = 0)::BIGINT AS l, " +
        "count(DISTINCT id % 20)::BIGINT AS df FROM d) " +
        "SELECT (2*n + 2*l) AS n_chains, (2*n) AS n_resolved, n AS n_hop1, " +
        "n AS n_hop2, (2*l) AS n_unresolved, (2*n) AS n_final_ok, " +
        "df AS n_distinct_final, n AS n_revisit, n AS n_refers_ok, " +
        "1::BIGINT AS n_profiles FROM a"),
    // anchor texts and targets are id arithmetic: 'read the <id> report'
    // (16 + digits chars) onto targ(id*31+7 % 20).io, 'more <id> details'
    // (13 + digits) onto targ(id*17+3 % 20).io; the relative anchor has
    // no registrable domain and drops
    "anchor_text" ->
      ("WITH d AS (SELECT doc_id AS id FROM documents), " +
        "e AS (SELECT 'targ' || ((id * 31 + 7) % 20)::VARCHAR || '.io' AS domain, " +
        "16 + len(id::VARCHAR) AS alen FROM d " +
        "UNION ALL SELECT 'targ' || ((id * 17 + 3) % 20)::VARCHAR || '.io', " +
        "13 + len(id::VARCHAR) FROM d) " +
        "SELECT domain, count(*)::BIGINT AS n_anchors, sum(alen)::BIGINT AS anchor_chars, " +
        "count(*)::BIGINT AS n_exact FROM e GROUP BY domain ORDER BY domain"),
    // the export loop replays from the corpus itself: every check holds
    // for every row, payload mass = the text's own UTF-8 byte mass
    "wet_export" ->
      ("SELECT count(*)::BIGINT AS n_docs, count(*)::BIGINT AS n_roundtrip, " +
        "count(*)::BIGINT AS n_uri_match, count(*)::BIGINT AS n_utf8, " +
        "sum(octet_length(encode(text)))::BIGINT AS payload_bytes FROM documents"),
    // the novel set is exactly the never-stored third: ids and domains
    // replay from id arithmetic (canonicalization + bloom + confirm join
    // must land there from the messy batch spellings)
    "frontier_incremental" -> frontierNovelOracleSql,
    // per-batch novelty against a static store unions to the batch
    // answer: the trigger machinery must not change one novel url
    "stream_frontier_probe" -> frontierNovelOracleSql,
    // scheduling replay: delay = 1 + (id%20)%5 per domain, budget =
    // 86400/delay, due per the changefreq->interval map at the pinned
    // as-of, priority mass on the x1000 grid — all id arithmetic
    // v2: due urls lane-split on the planted validators (id%4 — 0 ETag,
    // 1 Last-Modified, 2 both with ETag winning, 3 none -> full fetch)
    "crawl_schedule" ->
      ("WITH d AS (SELECT doc_id AS id, doc_id % 20 AS k FROM documents), " +
        "e AS (SELECT id, k, 'site' || k::VARCHAR || '.com' AS domain, " +
        "1 + (k % 5) AS delay_s, " +
        "CASE id % 5 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 7 WHEN 3 THEN 365 ELSE NULL END AS iv, " +
        "('2026-0' || (1 + id % 6)::VARCHAR || '-15')::DATE AS lastmod, " +
        "(id % 10) * 100 AS px, " +
        "(id % 4 IN (0, 2)) AS has_etag, (id % 4 IN (1, 2)) AS has_lm FROM d), " +
        "f AS (SELECT *, iv IS NOT NULL AND lastmod + to_days(iv) <= DATE '2026-08-16' AS due FROM e) " +
        "SELECT domain, min(delay_s)::BIGINT AS delay_s, " +
        "(86400 // min(delay_s))::BIGINT AS daily_budget, count(*)::BIGINT AS n_urls, " +
        "count(CASE WHEN due THEN 1 END)::BIGINT AS n_due, " +
        "count(CASE WHEN due AND has_etag THEN 1 END)::BIGINT AS n_if_none_match, " +
        "count(CASE WHEN due AND NOT has_etag AND has_lm THEN 1 END)::BIGINT AS n_if_modified_since, " +
        "count(CASE WHEN due AND NOT has_etag AND NOT has_lm THEN 1 END)::BIGINT AS n_full_fetch, " +
        "sum(px)::BIGINT AS priority_x1e3 FROM f GROUP BY domain ORDER BY domain"),
    // extraction replay: titles/descriptions/canonicals are constants of
    // the construction (both quoting arms must land on the same values);
    // canonical groups = distinct id/3
    "html_metadata" ->
      ("SELECT count(*)::BIGINT AS n_docs, count(*)::BIGINT AS n_title_exact, " +
        "count(*)::BIGINT AS n_desc_exact, count(*)::BIGINT AS n_canon_exact, " +
        "count(DISTINCT doc_id // 3)::BIGINT AS n_canonical_groups FROM documents"),
    // the sniffed type per arm is a construction constant (the three
    // codec arms produce real JPEG/PNG/gzip magic bytes), so counts and
    // id sums replay from doc_id % 6 alone
    "mime_sniff" ->
      ("WITH d AS (SELECT doc_id AS id, CASE doc_id % 6 " +
        "WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'image/png' " +
        "WHEN 2 THEN 'application/gzip' WHEN 3 THEN 'text/html' " +
        "WHEN 4 THEN 'text/plain' ELSE 'application/octet-stream' END AS mime FROM documents) " +
        "SELECT mime, count(*)::BIGINT AS n_payloads, count(*)::BIGINT AS n_expected, " +
        "sum(id)::BIGINT AS id_sum FROM d GROUP BY mime ORDER BY mime"),
    // frontier replay: urls, canonical collapses, lastmods, caps and
    // child-sitemap counts all re-derived from the planted construction
    // (two spellings per page -> one canonical; index docs -> 2 children)
    "sitemap_frontier" -> sitemapFrontierOracleSql,
    // the trigger machinery must not change one frontier count
    "stream_sitemap" -> sitemapFrontierOracleSql,
    // extraction replay: the expected extracted text is a constant of the
    // planted page; keep/reject decisions on both arms are determined by
    // the construction (500 vs 333 per-mille stopwords at a 450 bar)
    "html_main_content" ->
      ("WITH d AS (SELECT doc_id AS id FROM documents), " +
        "e AS (SELECT id, 'The story of document ' || id::VARCHAR || " +
        "' is told in the text and a reader is sure to enjoy it.' AS p1, " +
        "'A second paragraph of the article ' || id::VARCHAR || " +
        "' adds to the mass and is kept in the extraction.' AS p2 FROM d) " +
        "SELECT count(*)::BIGINT AS n_docs, count(*)::BIGINT AS n_exact, " +
        "sum(len(p1) + 1 + len(p2))::BIGINT AS extracted_chars, " +
        "0::BIGINT AS n_nav_leak, count(*)::BIGINT AS n_strip_nav, " +
        "count(*)::BIGINT AS extracted_keep, 0::BIGINT AS stripped_keep FROM e"),
    // the canonical key is a pure function of the page index k: FULL
    // values (distinct keys, redundancy, exact canonical character mass
    // 34 + len(k%30) + len(k) per row) replay from the construction — the
    // normalizer must land exactly there from all four messy spellings
    "url_canonical_dedup" ->
      ("WITH u AS (SELECT c_custkey AS id, c_custkey // 4 AS k FROM customer) " +
        "SELECT count(*)::BIGINT AS n_urls, count(DISTINCT k)::BIGINT AS n_canonical, " +
        "(count(*) - count(DISTINCT k))::BIGINT AS n_redundant, " +
        "sum(34 + len((k % 30)::VARCHAR) + len(k::VARCHAR))::BIGINT AS canon_chars, " +
        "count(DISTINCT k)::BIGINT AS n_pages FROM u"),
    // independent extraction + suffix replay: DuckDB builds the same html,
    // pulls hrefs with ITS regexp_extract_all, derives hosts and runs the
    // public-suffix algorithm over the reachable rule subset
    "html_link_graph" ->
      ("WITH docs AS (SELECT doc_id AS id, concat('<html><body><p>doc ', doc_id::VARCHAR, " +
        "'</p><a class=\"m\" href=\"https://a.site', ((doc_id * 31 + 7) % 20)::VARCHAR, " +
        "'.io/p\">one</a> <A HREF=''https://b.site', ((doc_id * 17 + 3) % 20)::VARCHAR, " +
        "'.io/q?z=1#frag''>two</A> <a href=\"/relative/path\">rel</a> " +
        "<a name=\"x\">no href</a></body></html>') AS html FROM documents), " +
        "l AS (SELECT id, unnest(regexp_extract_all(html, '(?i)<a\\s[^>]*href\\s*=\\s*[\"'']([^\"''#>]+)', 1)) AS link FROM docs), " +
        "h AS (SELECT id, rtrim(lower(regexp_extract(regexp_replace(link, '^//', ''), " +
        "'^(?:[a-z][a-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]*)', 1)), '.') AS host FROM l), " +
        "hl AS (SELECT host, string_split(host, '.') AS ls, len(string_split(host, '.')) AS nl " +
        "FROM (SELECT DISTINCT host FROM h WHERE host <> '')), " +
        "c2 AS (SELECT host, nl, ls, unnest(generate_series(1, nl)) AS i FROM hl), " +
        "c3 AS (SELECT host, nl, i, array_to_string(ls[i:], '.') AS cand FROM c2), " +
        "m AS (SELECT host, nl, min(CASE WHEN cand IN ('io', 'com') THEN i END) AS norm_i " +
        "FROM c3 GROUP BY host, nl), " +
        "dm AS (SELECT hl.host, CASE WHEN hl.nl < 2 THEN NULL " +
        "WHEN coalesce(m.norm_i, hl.nl) >= 2 THEN array_to_string(hl.ls[coalesce(m.norm_i, hl.nl) - 1:], '.') END AS domain " +
        "FROM m JOIN hl ON hl.host = m.host), " +
        "e AS (SELECT 'site' || (h.id % 20)::VARCHAR || '.io' AS src_domain, dm.domain AS dst_domain " +
        "FROM h JOIN dm ON dm.host = h.host WHERE dm.domain IS NOT NULL) " +
        "SELECT dst_domain, count(*)::BIGINT AS in_links, " +
        "count(DISTINCT src_domain)::BIGINT AS n_src_domains " +
        "FROM e GROUP BY dst_domain ORDER BY dst_domain"),
    // streaming the ingest must not change one record: warc_ingest's
    // construction replay VERBATIM
    "stream_warc_ingest" ->
      ("WITH d AS (SELECT doc_id AS id FROM documents), " +
        "b AS (SELECT id, 19 + len(id::VARCHAR) + 2 * ((id % 7) + 1) - 1 AS blen FROM d) " +
        "SELECT count(*)::BIGINT AS n_files, (count(*) * 4)::BIGINT AS n_records, " +
        "(count(*) * 2)::BIGINT AS n_responses, count(*)::BIGINT AS n_ok200, " +
        "sum(blen)::BIGINT AS body_chars, count(*)::BIGINT AS n_body_match FROM b"),
    // the whole ingest chain replayed from the construction: bodies are
    // keyed by id/2 (min id wins the exact dedup), the winner's domain
    // is site(id%20).io, then the ring-hash cap at 30 per domain — the
    // engine's gzip+WARC+HTTP+suffix+cap machinery must land exactly here
    "crawl_pipeline_e2e" ->
      ("WITH u AS (SELECT doc_id AS id FROM documents), " +
        "w AS (SELECT min(id) AS id FROM u GROUP BY id // 2), " +
        "d AS (SELECT id, 'site' || (id % 20)::VARCHAR || '.io' AS domain FROM w), " +
        "rk AS (SELECT id, domain, row_number() OVER (PARTITION BY domain " +
        "ORDER BY (id::HUGEINT * 2654435761) % 4294967296, id) AS rn FROM d) " +
        "SELECT domain, count(*)::BIGINT AS n_kept, sum(id)::BIGINT AS id_sum " +
        "FROM rk WHERE rn <= 30 GROUP BY domain ORDER BY domain"),
    // the round-17 composition: classes are pairs (2k, 2k+1) planted in
    // DIFFERENT encodings with per-id boilerplate — the min-id winner set
    // below is reachable ONLY if charset decoding unified the pair's text
    // and extraction dropped the per-id blocks; then domain + ring-hash
    // cap replay exactly as in crawl_pipeline_e2e
    "crawl_pipeline_v2" ->
      ("WITH u AS (SELECT doc_id AS id FROM documents), " +
        "w AS (SELECT min(id) AS id FROM u GROUP BY id // 2), " +
        "d AS (SELECT id, 'page' || (id % 20)::VARCHAR || '.com' AS domain FROM w), " +
        "rk AS (SELECT id, domain, row_number() OVER (PARTITION BY domain " +
        "ORDER BY (id::HUGEINT * 2654435761) % 4294967296, id) AS rn FROM d) " +
        "SELECT domain, count(*)::BIGINT AS n_kept, sum(id)::BIGINT AS id_sum " +
        "FROM rk WHERE rn <= 25 GROUP BY domain ORDER BY domain"),
    // rules-table replay of the RFC 9309 semantics: group selection
    // (named group if the variant has one, else '*'), pattern->regex
    // conversion ('*' -> '.*', trailing '$' kept as anchor), longest
    // pattern wins with allow on ties, no-match defaults to allowed
    "robots_filter" ->
      ("WITH u AS (SELECT c_custkey AS id, c_custkey % 3 AS v, CASE " +
        "WHEN c_custkey % 5 = 0 THEN '/index' " +
        "WHEN c_custkey % 5 = 1 THEN '/admin/settings' " +
        "WHEN c_custkey % 5 = 2 THEN '/admin/public/page' " +
        "WHEN c_custkey % 5 = 3 THEN concat('/private/', c_custkey::VARCHAR) " +
        "ELSE '/private/ok' END AS path FROM customer), " +
        "r(v, agent, allow, pattern) AS (VALUES " +
        "(0, '*', 0, '/admin'), (0, '*', 1, '/admin/public'), " +
        "(1, 'graftbot', 0, '/private*'), (1, 'graftbot', 1, '/private/ok$'), (1, '*', 0, '/'), " +
        "(2, 'otherbot', 0, '/')), " +
        "g AS (SELECT v, max(CASE WHEN agent = 'graftbot' THEN 1 ELSE 0 END) AS has_named " +
        "FROM r GROUP BY v), " +
        "eff AS (SELECT r.v, r.allow, r.pattern, len(r.pattern) AS plen FROM r JOIN g USING (v) " +
        "WHERE (g.has_named = 1 AND r.agent = 'graftbot') OR (g.has_named = 0 AND r.agent = '*')), " +
        "m AS (SELECT u.id, u.v, e.allow, e.plen FROM u LEFT JOIN eff e ON e.v = u.v " +
        "AND regexp_matches(u.path, '^' || " +
        "replace(CASE WHEN e.pattern LIKE '%$' THEN substr(e.pattern, 1, len(e.pattern) - 1) ELSE e.pattern END, '*', '.*') || " +
        "CASE WHEN e.pattern LIKE '%$' THEN '$' ELSE '' END)), " +
        "rk AS (SELECT id, v, allow, row_number() OVER (PARTITION BY id " +
        "ORDER BY plen DESC NULLS LAST, allow DESC) AS rn FROM m), " +
        "verdict AS (SELECT id, v, " +
        "CASE WHEN allow IS NULL THEN true WHEN allow = 1 THEN true ELSE false END AS ok " +
        "FROM rk WHERE rn = 1) " +
        "SELECT v::BIGINT AS v, count(*)::BIGINT AS n_urls, " +
        "count(CASE WHEN ok THEN 1 END)::BIGINT AS n_allowed, " +
        "coalesce(sum(CASE WHEN ok THEN id END), 0)::BIGINT AS allowed_id_sum " +
        "FROM verdict GROUP BY v ORDER BY v"),
    // the domain replay composed with the ring-hash cap: same suffix
    // algorithm as url_domain_report, then row_number per domain in
    // (idHash, id) order, keep rn <= 40, null domains excluded
    "url_domain_caps" ->
      ("WITH u AS (SELECT c_custkey AS id, CASE " +
        "WHEN c_custkey % 12 = 0 THEN concat('https://shop', (c_custkey % 97)::VARCHAR, '.example.com/products?id=', c_custkey::VARCHAR) " +
        "WHEN c_custkey % 12 = 1 THEN concat('http://user@www', (c_custkey % 13)::VARCHAR, '.webmail.co.uk:8080/inbox') " +
        "WHEN c_custkey % 12 = 2 THEN concat('media', (c_custkey % 7)::VARCHAR, '.cdn.ac.uk') " +
        "WHEN c_custkey % 12 = 3 THEN concat('https://192.168.', (c_custkey % 256)::VARCHAR, '.', (c_custkey % 250)::VARCHAR, '/admin') " +
        "WHEN c_custkey % 12 = 4 THEN concat('https://news.site', (c_custkey % 11)::VARCHAR, '.com.au/a') " +
        "WHEN c_custkey % 12 = 5 THEN 'ftp://files.archive.org:21/pub' " +
        "WHEN c_custkey % 12 = 6 THEN 'https://www.gov.ck/services' " +
        "WHEN c_custkey % 12 = 7 THEN 'https://www.ck/index' " +
        "WHEN c_custkey % 12 = 8 THEN 'http://localhost:3000/dev' " +
        "WHEN c_custkey % 12 = 9 THEN concat('https://api.v', (c_custkey % 3)::VARCHAR, '.app', (c_custkey % 19)::VARCHAR, '.io/v1/q') " +
        "WHEN c_custkey % 12 = 10 THEN concat('//assets.tienda', (c_custkey % 23)::VARCHAR, '.com.mx/img.png') " +
        "ELSE concat('dash.metrics', (c_custkey % 5)::VARCHAR, '.example.co.jp.') END AS url FROM customer), " +
        "h AS (SELECT id, rtrim(lower(regexp_extract(regexp_replace(url, '^//', ''), " +
        "'^(?:[a-z][a-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]*)', 1)), '.') AS host FROM u), " +
        "hl AS (SELECT host, string_split(host, '.') AS ls, len(string_split(host, '.')) AS nl " +
        "FROM (SELECT DISTINCT host FROM h)), " +
        "c2 AS (SELECT host, nl, ls, unnest(generate_series(1, nl)) AS i FROM hl), " +
        "c3 AS (SELECT host, nl, i, array_to_string(ls[i:], '.') AS cand, " +
        "CASE WHEN i < nl THEN array_to_string(ls[i+1:], '.') END AS tail FROM c2), " +
        "m AS (SELECT host, nl, " +
        "min(CASE WHEN cand IN ('www.ck') THEN i END) AS exc_i, " +
        "min(CASE WHEN cand IN ('com','org','io','uk','co.uk','ac.uk','au','com.au','mx','com.mx','jp','co.jp') THEN i END) AS norm_i, " +
        "min(CASE WHEN tail IN ('ck') THEN i END) AS wild_i FROM c3 GROUP BY host, nl), " +
        "ps AS (SELECT host, CASE WHEN exc_i IS NOT NULL THEN exc_i + 1 " +
        "WHEN norm_i IS NOT NULL OR wild_i IS NOT NULL THEN least(coalesce(norm_i, 9999), coalesce(wild_i, 9999)) " +
        "ELSE nl END AS s FROM m), " +
        "dm AS (SELECT hl.host, CASE " +
        "WHEN regexp_matches(hl.host, '^[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}$') THEN NULL " +
        "WHEN hl.nl < 2 THEN NULL " +
        "WHEN ps.s >= 2 THEN array_to_string(hl.ls[ps.s - 1:], '.') END AS domain " +
        "FROM ps JOIN hl ON hl.host = ps.host), " +
        "r AS (SELECT h.id, dm.domain FROM h JOIN dm ON dm.host = h.host WHERE dm.domain IS NOT NULL), " +
        "rk AS (SELECT id, domain, row_number() OVER (PARTITION BY domain " +
        "ORDER BY (id::HUGEINT * 2654435761) % 4294967296, id) AS rn FROM r) " +
        "SELECT domain, count(*)::BIGINT AS n_kept, sum(id)::BIGINT AS id_sum " +
        "FROM rk WHERE rn <= 40 GROUP BY domain ORDER BY domain"),
    // oriented-wedge triangle recompute over the same planted graph
    "triangle_count" ->
      ("WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents), " +
        // UNION ALL instead of unnest-over-CTE: DuckDB 1.0.0's binder
        // asserts on DISTINCT over an unnest column routed through CTEs
        "e0 AS (SELECT doc_id AS src, (doc_id*31+7) % (SELECT n FROM nn) AS dst FROM documents " +
        "UNION ALL SELECT doc_id, (doc_id*17+3) % (SELECT n FROM nn) FROM documents " +
        "UNION ALL SELECT doc_id, (doc_id*13+11) % (SELECT n FROM nn) FROM documents), " +
        "e AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi FROM e0 WHERE src != dst), " +
        "w AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c FROM e e1 JOIN e e2 ON e1.hi = e2.lo), " +
        "t AS (SELECT * FROM w WHERE EXISTS (SELECT 1 FROM e WHERE e.lo = w.a AND e.hi = w.c)) " +
        "SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges, " +
        "(SELECT count(*) FROM w)::BIGINT AS n_wedges, " +
        "(SELECT count(*) FROM t)::BIGINT AS n_triangles"),
    // planted-containment recompute: exact distinct-3-gram sets, both the
    // asymmetric containment and the symmetric jaccard at 0.9
    "dedup_containment" ->
      ("WITH base AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 2000000000000, text || ' ' || translate(text, 'abcdefghijklmnopqrstuvwxyz', 'nopqrstuvwxyzabcdefghijklm') " +
        "FROM documents WHERE doc_id % 20 = 0), " +
        "toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM base), " +
        "g AS (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3 " +
        "THEN [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)] ELSE [] END) AS gr FROM toks), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.gr, b.gr)) AS i, len(a.gr) AS la, len(b.gr) AS lb " +
        "FROM g a JOIN g b ON a.doc_id < b.doc_id WHERE len(a.gr) > 0 AND len(b.gr) > 0) " +
        "SELECT (SELECT count(*) FROM p WHERE greatest(i::DOUBLE / la, i::DOUBLE / lb) >= 0.9)::BIGINT AS n_containment, " +
        "(SELECT coalesce(sum(id_a + id_b), 0) FROM p WHERE greatest(i::DOUBLE / la, i::DOUBLE / lb) >= 0.9)::BIGINT AS pair_id_sum, " +
        "(SELECT count(*) FROM p WHERE i::DOUBLE / (la + lb - i) >= 0.9)::BIGINT AS n_jaccard"),
    // corpus-relative novelty: df over distinct (doc, gram), df=1 share
    "ngram_novelty" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "g0 AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 3 " +
        "THEN [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)] ELSE [] END) AS gram FROM toks), " +
        "g AS (SELECT DISTINCT doc_id, gram FROM g0), " +
        "dfreq AS (SELECT gram, count(*) AS df FROM g GROUP BY gram), " +
        "j AS (SELECT g.doc_id, count(*)::BIGINT AS n_grams, " +
        "count(CASE WHEN df = 1 THEN 1 END)::BIGINT AS n_unique " +
        "FROM g JOIN dfreq USING (gram) GROUP BY g.doc_id) " +
        "SELECT doc_id, n_grams, n_unique, (n_unique * 10000 // n_grams)::BIGINT AS novelty_x1e4 " +
        "FROM j ORDER BY doc_id"),
    // elementwise integer-grid centroid, parallel-unnest recompute
    "embed_centroid" ->
      ("WITH x AS (SELECT label, unnest(range(1, len(embedding)+1)) AS pos, " +
        "unnest(list_transform(embedding, e -> round(e::DOUBLE * 1000000)::BIGINT)) AS c FROM embeddings) " +
        // exact FLOOR division in pure integers: subtract the pmod first
        // (DuckDB's // truncates toward zero on negatives, and floor()
        // over a double quotient loses exactness past 2^53)
        "SELECT label::BIGINT AS label, pos::BIGINT AS pos, count(c)::BIGINT AS n, " +
        "sum(c)::BIGINT AS s, " +
        "((sum(c) - ((sum(c) % count(c)) + count(c)) % count(c)) // count(c))::BIGINT AS mean_x1e6 " +
        // HAVING mirrors the operator: an all-null (label, pos) group has
        // no countable elements and is absent, never a divide-by-zero
        "FROM x GROUP BY label, pos HAVING count(c) > 0 ORDER BY label, pos"),
    // per-column profile as a UNION ALL of single-column aggregates
    "profile_table" ->
      (Seq("doc_id", "lang", "n_chars", "source", "text").map { c =>
        s"SELECT '$c' AS column_name, count(*)::BIGINT AS n_rows, " +
          s"count(CASE WHEN $c IS NULL THEN 1 END)::BIGINT AS n_null, " +
          s"count(DISTINCT $c)::BIGINT AS n_distinct, " +
          s"min($c)::VARCHAR AS min_str, max($c)::VARCHAR AS max_str FROM documents"
      }.mkString("", " UNION ALL ", " ORDER BY column_name")),
    // latest-3 window recomputed as a (ts DESC, event_id ASC) rank
    "latest_k_events" ->
      ("WITH r AS (SELECT user_id, event_id, value, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id ASC) AS rn " +
        "FROM events) " +
        "SELECT count(*)::BIGINT AS n_rows, count(DISTINCT user_id)::BIGINT AS n_users, " +
        "sum(event_id)::BIGINT AS id_sum, sum(round(value * 100))::BIGINT AS value_cent_sum " +
        "FROM r WHERE rn <= 3"),
    // exact-jaccard pair set (as dedup_ngram) bucketed on the 0.05 grid
    "pair_similarity_hist" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "g AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, greatest(len(t)-1, 1))]) AS gr FROM toks), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.gr, b.gr))::DOUBLE / (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))) AS j " +
        "FROM g a JOIN g b ON a.doc_id < b.doc_id) " +
        "SELECT least(floor(j * 20)::BIGINT, 19) AS bucket, count(*)::BIGINT AS n_pairs, " +
        "sum(id_a + id_b)::BIGINT AS pair_id_sum " +
        "FROM p WHERE j >= 0.2 GROUP BY 1 ORDER BY 1"),
    // Fleiss' kappa integer sufficient statistics, full recompute
    "annotator_kappa" ->
      ("WITH v AS (SELECT doc_id, lang AS label FROM documents " +
        "UNION ALL SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END FROM documents " +
        "UNION ALL SELECT doc_id, CASE WHEN doc_id % 21 = 0 THEN 'xx' " +
        "WHEN doc_id % 13 = 0 THEN 'yy' ELSE lang END FROM documents), " +
        "counts AS (SELECT doc_id, label, count(*)::BIGINT AS nij FROM v GROUP BY doc_id, label), " +
        "pi AS (SELECT doc_id, sum(nij) AS ni, sum(nij * nij) AS s2i FROM counts GROUP BY doc_id), " +
        "el AS (SELECT doc_id FROM pi WHERE ni = 3), " +
        "it AS (SELECT count(*)::BIGINT AS n_items, coalesce(sum(s2i), 0)::BIGINT AS s2_sum FROM pi WHERE ni = 3), " +
        "dr AS (SELECT count(*)::BIGINT AS n_dropped FROM pi WHERE ni != 3), " +
        "cj AS (SELECT label, sum(nij) AS cjn FROM counts JOIN el USING (doc_id) GROUP BY label), " +
        "c2 AS (SELECT coalesce(sum(cjn * cjn), 0)::BIGINT AS cj2_sum FROM cj) " +
        "SELECT n_items, 3::BIGINT AS n_raters, n_dropped, s2_sum, cj2_sum, " +
        "((s2_sum - n_items * 3) * (n_items * 3) - 2 * cj2_sum)::BIGINT AS kappa_num, " +
        "(2 * ((n_items * 3) * (n_items * 3) - cj2_sum))::BIGINT AS kappa_den " +
        "FROM it, dr, c2"),
    // hashed-feature importance ratio, full integer recompute
    "dsir_select" ->
      ("WITH toks AS (SELECT doc_id, lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM documents), " +
        "tb AS (SELECT doc_id, lang, (length(tok) * 31 + ascii(tok)) % 64 AS b FROM toks WHERE tok != ''), " +
        "hist AS (SELECT b, count(*)::BIGINT AS n_raw, " +
        "count(CASE WHEN lang = 'en' THEN 1 END)::BIGINT AS n_target FROM tb GROUP BY b), " +
        "ratio AS (SELECT b, (n_target * 1000000 // n_raw)::BIGINT AS r FROM hist) " +
        "SELECT doc_id, sum(r)::BIGINT AS score_x1e6, count(*)::BIGINT AS n_tokens " +
        "FROM tb JOIN ratio USING (b) GROUP BY doc_id " +
        "ORDER BY score_x1e6 DESC, doc_id LIMIT 20"),
    // keep-best recomputed as a (quality desc, id asc) window over the
    // same first-3-token fuzzy key
    "dedup_keep_best" ->
      ("WITH k AS (SELECT doc_id, n_chars, " +
        "array_to_string(list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t != '')[1:3], ' ') AS key " +
        "FROM documents), " +
        "w AS (SELECT doc_id, n_chars, row_number() OVER (PARTITION BY key ORDER BY n_chars DESC, doc_id ASC) AS rn FROM k) " +
        "SELECT count(*)::BIGINT AS n_kept, sum(doc_id)::BIGINT AS kept_id_sum, " +
        "sum(n_chars)::BIGINT AS kept_chars_sum, " +
        "(SELECT count(*) FROM documents)::BIGINT AS n_docs FROM w WHERE rn = 1"),
    // per-class k-anonymity/l-diversity over (nation, segment)
    "k_anonymity" ->
      ("WITH c AS (SELECT c_nationkey::BIGINT AS nat, c_mktsegment AS seg, " +
        "round(c_acctbal * 100)::BIGINT AS bal_cents FROM customer) " +
        "SELECT nat, seg, count(*)::BIGINT AS class_size, " +
        "count(DISTINCT bal_cents)::BIGINT AS l_diversity, " +
        "(count(*) >= 10)::BIGINT AS k_ok, " +
        "(count(DISTINCT bal_cents) >= 5)::BIGINT AS l_ok " +
        "FROM c GROUP BY nat, seg ORDER BY nat, seg"),
    // one-sided TVD replayed on the exact integer grid: per (class, band)
    // positive part max(cnt_cv*N - cnt_v*n_c, 0), one floor per class
    "t_closeness" ->
      ("WITH c AS (SELECT c_nationkey::BIGINT AS nat, c_mktsegment AS seg, " +
        "(round(c_acctbal * 100)::BIGINT - ((round(c_acctbal * 100)::BIGINT % 100000) + 100000) % 100000) AS bal_band FROM customer), " +
        "n AS (SELECT count(*)::BIGINT AS n_all FROM c), " +
        "g AS (SELECT bal_band, count(*)::BIGINT AS cnt_v FROM c GROUP BY bal_band), " +
        "cc AS (SELECT nat, seg, bal_band, count(*)::BIGINT AS cnt_cv FROM c GROUP BY nat, seg, bal_band), " +
        "cs AS (SELECT nat, seg, sum(cnt_cv)::BIGINT AS n_c FROM cc GROUP BY nat, seg), " +
        "p AS (SELECT cc.nat, cc.seg, cs.n_c, " +
        "greatest(cc.cnt_cv * (SELECT n_all FROM n) - g.cnt_v * cs.n_c, 0) AS pos " +
        "FROM cc JOIN g ON g.bal_band IS NOT DISTINCT FROM cc.bal_band " +
        "JOIN cs ON cs.nat = cc.nat AND cs.seg = cc.seg) " +
        "SELECT nat, seg, n_c AS class_size, " +
        "((sum(pos) * 1000000) // (n_c * (SELECT n_all FROM n)))::BIGINT AS t_ppm, " +
        "(((sum(pos) * 1000000) // (n_c * (SELECT n_all FROM n)))::BIGINT <= 200000)::BIGINT AS t_ok " +
        "FROM p GROUP BY nat, seg, n_c ORDER BY nat, seg"),
    // full replay of the DP release: true counts + the IDENTICAL
    // generated noise-draw CASE (exact integer thresholds) over the
    // DuckDB spelling of the same secret-seeded 60-bit md5 hash — the
    // key builder is SHARED with the engine side (Privacy.hash60DuckSql)
    // and the test's own secret seeds the token, so the replay is the
    // correctness check, not a de-noising leak (advisor r16)
    "dp_counts" ->
      ("WITH c AS (SELECT c_nationkey::BIGINT AS nat, c_mktsegment AS seg FROM customer), " +
        "g AS (SELECT nat, seg, count(*)::BIGINT AS n FROM c GROUP BY nat, seg) " +
        "SELECT nat, seg, (n + " +
        graft.operators.Privacy.dpNoiseCaseSql(
          graft.operators.Privacy.hash60DuckSql(
            graft.operators.Privacy.dpSeedToken(graft.Defaults.testPassphrase, "r16-census"),
            Seq("nat", "seg"))) +
        ")::BIGINT AS n_noisy FROM g ORDER BY nat, seg"),
    // clamp + sum + the identical generated noise CASE scaled by clip
    "dp_sums" ->
      ("WITH c AS (SELECT c_mktsegment AS seg, " +
        "least(greatest(round(c_acctbal * 100)::BIGINT, 0), 100000) AS v FROM customer), " +
        "g AS (SELECT seg, sum(v)::BIGINT AS s FROM c GROUP BY seg) " +
        "SELECT seg, (s + 100000 * " +
        graft.operators.Privacy.dpNoiseCaseSql(
          graft.operators.Privacy.hash60DuckSql(
            graft.operators.Privacy.dpSeedToken(graft.Defaults.testPassphrase, "r16-balances"),
            Seq("seg"))) +
        ")::BIGINT AS sum_noisy FROM g ORDER BY seg"),
    // before/after anonymity of the treatment set: suppress name,
    // generalize nation to 10-wide groups
    "mask_k_anon" ->
      ("WITH c AS (SELECT c_name, c_nationkey::BIGINT AS nat, c_mktsegment AS seg, " +
        "round(c_acctbal * 100)::BIGINT AS bal_cents FROM customer), " +
        "b AS (SELECT c_name, nat, seg, count(*)::BIGINT AS cs, " +
        "count(DISTINCT bal_cents)::BIGINT AS ld FROM c GROUP BY 1, 2, 3), " +
        "a AS (SELECT 'suppressed' AS c_name, nat - ((nat % 10) + 10) % 10 AS nat, seg, " +
        "count(*)::BIGINT AS cs, count(DISTINCT bal_cents)::BIGINT AS ld FROM c GROUP BY 1, 2, 3), " +
        "r AS (SELECT 'before' AS phase, cs, ld FROM b UNION ALL SELECT 'after' AS phase, cs, ld FROM a) " +
        "SELECT phase, count(*)::BIGINT AS n_classes, min(cs)::BIGINT AS min_class_size, " +
        "sum(CASE WHEN cs < 5 THEN cs ELSE 0 END)::BIGINT AS rows_below_k, " +
        "(count(*) = sum(CASE WHEN cs >= 5 THEN 1 ELSE 0 END))::BIGINT AS all_k_ok, " +
        "(count(*) = sum(CASE WHEN ld >= 3 THEN 1 ELSE 0 END))::BIGINT AS all_l_ok " +
        "FROM r GROUP BY phase ORDER BY phase"),
    // ladder of balance-bucket widths; chosen = minimal width meeting k=10
    "generalize_k_anon" ->
      ("WITH c AS (SELECT c_mktsegment AS seg, round(c_acctbal * 100)::BIGINT AS cents FROM customer), " +
        "lv AS (SELECT w FROM (VALUES (10000), (100000), (1000000), (100000000)) t(w)), " +
        "g AS (SELECT w, seg, cents - ((cents % w) + w) % w AS bucket, count(*) AS class_size " +
        "FROM c CROSS JOIN lv GROUP BY 1, 2, 3), " +
        "p AS (SELECT w, count(*) AS n_classes, min(class_size) AS min_class_size, " +
        "coalesce(sum(CASE WHEN class_size < 10 THEN class_size END), 0) AS rows_below_k " +
        "FROM g GROUP BY w) " +
        "SELECT w::BIGINT AS width, n_classes::BIGINT AS n_classes, " +
        "min_class_size::BIGINT AS min_class_size, rows_below_k::BIGINT AS rows_below_k, " +
        "coalesce(w = min(CASE WHEN min_class_size >= 10 THEN w END) OVER (), false)::BIGINT AS chosen " +
        "FROM p ORDER BY width"),
    // same planted footer lines; doc-freq >= 50 lines drop everywhere
    "dedup_lines_global" ->
      ("WITH t AS (SELECT doc_id, text " +
        "|| CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'subscribe to our newsletter' ELSE '' END " +
        "|| CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'all rights reserved' ELSE '' END " +
        "|| chr(10) || 'tail ' || doc_id AS text FROM documents), " +
        "l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM t), " +
        "e AS (SELECT doc_id, generate_subscripts(lines, 1) AS pos, unnest(lines) AS line FROM l), " +
        "n AS (SELECT doc_id, pos, line, trim(lower(line)) AS norm FROM e), " +
        "hot AS (SELECT norm FROM n WHERE norm <> '' GROUP BY norm HAVING count(DISTINCT doc_id) >= 50), " +
        "kept AS (SELECT * FROM n WHERE norm NOT IN (SELECT norm FROM hot)), " +
        "r AS (SELECT doc_id, count(*)::BIGINT AS n_lines_after, " +
        "string_agg(line, chr(10) ORDER BY pos) AS clean_text FROM kept GROUP BY doc_id) " +
        "SELECT l.doc_id, len(l.lines)::BIGINT AS n_lines_before, " +
        "coalesce(r.n_lines_after, 0)::BIGINT AS n_lines_after, " +
        "coalesce(r.clean_text, '') AS clean_text " +
        "FROM l LEFT JOIN r USING (doc_id) ORDER BY doc_id"),
    // per-language mixture plan vs explicit target ppm under a 1B budget
    "mixture_plan" ->
      ("WITH c AS (SELECT lang AS grp, sum(n_chars)::BIGINT AS tokens FROM documents " +
        "WHERE lang IS NOT NULL GROUP BY lang), " +
        "tot AS (SELECT sum(tokens)::BIGINT AS total FROM c), " +
        "t AS (SELECT grp, tokens, (CASE grp WHEN 'en' THEN 500000 WHEN 'zh' THEN 200000 " +
        "WHEN 'de' THEN 150000 WHEN 'fr' THEN 100000 WHEN 'es' THEN 50000 ELSE 0 END)::BIGINT AS target_ppm FROM c) " +
        "SELECT grp, tokens, round(tokens::DOUBLE * 1000000 / total)::BIGINT AS actual_ppm, " +
        "target_ppm, round(target_ppm::DOUBLE * total / greatest(tokens, 1))::BIGINT AS weight_x1e6, " +
        "((target_ppm * 1000000000) // 1000000)::BIGINT AS planned_tokens, " +
        "round(((target_ppm * 1000000000) // 1000000)::DOUBLE * 100 / greatest(tokens, 1))::BIGINT AS epochs_x100 " +
        "FROM t, tot ORDER BY grp"),
    // trailing-window integer z^2 inequality, per user, 20-row lookback
    "anomaly_zscore" ->
      ("WITH k AS (SELECT user_id, event_id, ts, round(value * 100)::BIGINT AS cents FROM events), " +
        "w AS (SELECT user_id, event_id, cents, " +
        "count(cents) OVER win AS n_baseline, sum(cents) OVER win AS s, " +
        "sum(cents * cents) OVER win AS q FROM k " +
        "WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)) " +
        "SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id, cents, " +
        "n_baseline::BIGINT AS n_baseline, " +
        "(n_baseline >= 8 AND (n_baseline * cents - s) * (n_baseline * cents - s) * (n_baseline - 1) " +
        "> 9 * n_baseline * (n_baseline * q - s * s))::BIGINT AS flagged " +
        "FROM w ORDER BY user_id, event_id"),
    "mask_string_props" ->
      ("SELECT count(*) AS n, count(c_name) AS n_nonnull, count(c_name) AS n_len16, " +
        "count(c_name) AS n_alpha, count(c_name) AS n_stable, count(c_name) AS n_numeric, " +
        "count(DISTINCT c_name) AS n_distinct_in, count(DISTINCT c_name) AS n_distinct_out FROM customer"),
    "mask_format_props" ->
      "SELECT count(*) AS n, count(c_name) AS n_nonnull, count(c_name) AS n_formatted FROM customer",
    // FF1 FPE contract: every property holds for EVERY row (the cipher is
    // a deterministic permutation of the 16-digit domain), so each count
    // pins to the row count; injectivity pins distinct out == distinct in
    "mask_fpe_props" ->
      ("SELECT count(*) AS n, count(*) AS n_nonnull, count(*) AS n_format, " +
        "count(*) AS n_stable, count(*) AS n_roundtrip, count(*) AS n_tweak_sep, " +
        "count(DISTINCT c_custkey) AS n_distinct_in, count(DISTINCT c_custkey) AS n_distinct_out " +
        "FROM customer"),
    // rank-then-encipher contract: every property holds for every row and
    // masking is injective on the observed population (distinct-preserving)
    "mask_fpe_number" ->
      ("SELECT count(*) AS n, count(*) AS n_nonnull, count(*) AS n_in_domain, " +
        "count(*) AS n_stable, count(*) AS n_tweak_sep, count(*) AS n_roundtrip, " +
        "count(DISTINCT round(c_acctbal * 100)) AS n_distinct_in, " +
        "count(DISTINCT round(c_acctbal * 100)) AS n_distinct_out, " +
        "count(*) AS n_d_in_domain, count(*) AS n_d_roundtrip FROM customer"),
    "mask_date_props" ->
      "SELECT count(*) AS n, count(o_orderdate) AS n_nonnull, count(o_orderdate) AS n_inbounds FROM orders",
    "mask_timestamp_props" ->
      "SELECT count(*) AS n, count(l_shipdate) AS n_nonnull, count(l_shipdate) AS n_inbounds FROM lineitem",
    "mask_decimal_props" ->
      "SELECT count(*) AS n, count(c_acctbal) AS n_nonnull, count(c_acctbal) AS n_inbounds FROM customer",
    "mask_transform" ->
      ("SELECT count(*) AS n, count(c_name) AS n_name_masked, " +
        "count(DISTINCT c_mktsegment) AS n_segments, count(c_acctbal) AS n_bal_inbounds FROM customer"),
    "mask_name_vocab" ->
      ("SELECT count(*) AS n, count(c_name) AS n_nonnull, count(c_name) AS n_in_vocab, " +
        "count(c_name) AS n_stable FROM customer"),
    "mask_email_vocab" ->
      "SELECT count(*) AS n, count(c_name) AS n_valid FROM customer",
    "mask_via_distinct" ->
      ("SELECT count(*) AS n, count(c_name) AS n_nonnull, " +
        "count(DISTINCT c_name) AS n_distinct_out FROM customer"),
    "mask_argon2_rate" ->
      ("SELECT count(*) AS n, count(c_name) AS n_nonnull, count(c_name) AS n_len16, " +
        "count(DISTINCT c_name) AS n_distinct_out FROM customer"),
    "mask_stream" ->
      ("SELECT count(*) AS n, count(*) AS n_len16, count(*) AS n_match " +
        "FROM customer WHERE c_custkey % 10 = 0"),
    "dedup_exact" ->
      "SELECT count(DISTINCT text) AS n_clusters, count(*) AS n_rows FROM documents",
    // exact char-5-gram jaccard pairs; the LSH output is compared against the
    // true pair set (32x4 banding => ~1e-15 miss probability at j>=0.9)
    "dedup_minhash" ->
      ("WITH sh AS (SELECT doc_id, list_distinct([text[i:i+4] FOR i IN range(1, greatest(len(text)-3, 1))]) AS s FROM documents), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.s, b.s))::DOUBLE / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id) " +
        "SELECT count(*) AS n_pairs, coalesce(sum(id_a + id_b), 0)::BIGINT AS pair_id_sum FROM p WHERE j >= 0.8"),
    "dedup_components" ->
      ("WITH sh AS (SELECT doc_id, list_distinct([text[i:i+4] FOR i IN range(1, greatest(len(text)-3, 1))]) AS s FROM documents), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.s, b.s))::DOUBLE / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id), " +
        "e AS (SELECT id_a AS a, id_b AS b FROM p WHERE j >= 0.8 UNION SELECT id_b, id_a FROM p WHERE j >= 0.8), " +
        "reach AS (WITH RECURSIVE r(a, b) AS (SELECT a, b FROM e " +
        "UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a WHERE r.a <> e.b) SELECT * FROM r), " +
        "comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a) " +
        "SELECT count(DISTINCT component) AS n_components, count(*) AS n_clustered_docs, " +
        "sum(DISTINCT component)::BIGINT AS rep_id_sum FROM comp"),
    // chains of consecutive ids = gaps-and-islands: component = min(id)
    // over island (id - row_number() is constant per consecutive run) —
    // no recursive walk needed, exact at any scale
    "cc_chain_star" -> ccChainStarOracleSql,
    // identical labels by contract (validate only adds checks) — same oracle
    "cc_chain_star_novalidate" -> ccChainStarOracleSql,
    // shared verbatim: the incremental merge must equal the full recompute
    "cc_incremental" -> ccChainStarOracleSql,
    "dedup_drop" ->
      ("WITH sh AS (SELECT doc_id, list_distinct([text[i:i+4] FOR i IN range(1, greatest(len(text)-3, 1))]) AS s FROM documents), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.s, b.s))::DOUBLE / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id), " +
        "e AS (SELECT id_a AS a, id_b AS b FROM p WHERE j >= 0.8 UNION SELECT id_b, id_a FROM p WHERE j >= 0.8), " +
        "reach AS (WITH RECURSIVE r(a, b) AS (SELECT a, b FROM e " +
        "UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a WHERE r.a <> e.b) SELECT * FROM r), " +
        "comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a) " +
        "SELECT (SELECT count(*) FROM documents) - (SELECT count(*) FROM comp WHERE doc_id <> component) AS n_kept, " +
        "((SELECT sum(doc_id) FROM documents) - (SELECT coalesce(sum(doc_id), 0) FROM comp WHERE doc_id <> component))::BIGINT AS kept_id_sum"),
    // same counts, same add-0.5 smoothing, same 1e-4 grid nudge
    "lm_score" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "uni AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w), " +
        "bg AS (SELECT bgk, count(*) AS c2 FROM (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bgk " +
        "FROM toks WHERE len(t) >= 2) GROUP BY bgk), " +
        "v AS (SELECT count(*)::DOUBLE AS v FROM uni), " +
        "e AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS b FROM " +
        "(SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2)), " +
        "s AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams, " +
        "floor(avg(ln((coalesce(c2, 0) + 0.5) / (coalesce(c1, 0) + 0.5 * v))) * 10000 + 0.000001)::BIGINT AS avg_logp_x1e4 " +
        "FROM e LEFT JOIN bg ON e.b = bg.bgk LEFT JOIN uni ON e.w1 = uni.w CROSS JOIN v GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams, " +
        "coalesce(s.avg_logp_x1e4, 0)::BIGINT AS avg_logp_x1e4 " +
        "FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id"),
    // merge == retrain: counts are additive, so the oracle replays the
    // whole-corpus tables and the 20-doc probe scores from the corpus
    // alone; audits are zero-by-construction
    "lm_store_roundtrip" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "uni AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w), " +
        "bg AS (SELECT bgk, count(*) AS c2 FROM (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bgk " +
        "FROM toks WHERE len(t) >= 2) GROUP BY bgk), " +
        "v AS (SELECT count(*)::DOUBLE AS v FROM uni), " +
        "e AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS b FROM " +
        "(SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2 AND doc_id < 20)), " +
        "s AS (SELECT doc_id, floor(avg(ln((coalesce(c2, 0) + 0.5) / (coalesce(c1, 0) + 0.5 * v))) * 10000 + 0.000001)::BIGINT AS sc " +
        "FROM e LEFT JOIN bg ON e.b = bg.bgk LEFT JOIN uni ON e.w1 = uni.w CROSS JOIN v GROUP BY doc_id) " +
        "SELECT (SELECT count(*) FROM bg)::BIGINT AS bg_rows, 0::BIGINT AS bg_mismatch, " +
        "(SELECT count(*) FROM uni)::BIGINT AS uni_rows, 0::BIGINT AS uni_mismatch, " +
        "(SELECT count(*) FROM documents WHERE doc_id < 20)::BIGINT AS scored_docs, 0::BIGINT AS score_mismatch, " +
        "(SELECT sum(coalesce(s.sc, 0)) FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id WHERE d.doc_id < 20)::BIGINT AS score_checksum"),
    // same ring arithmetic: key = (id*2654435761 + mixedSeed) mod 2^32,
    // mixedSeed = (7*2654435761) ^ (7 >>> 17) = 18581050327
    "epoch_shuffle" ->
      ("SELECT doc_id, ((doc_id::HUGEINT * 2654435761 + 18581050327) % 4294967296)::BIGINT AS epoch_key " +
        "FROM documents ORDER BY epoch_key, doc_id LIMIT 20"),
    // full per-doc value compare: same regexp pipeline in the shared
    // Java-regex/RE2 subset
    "text_normalize" ->
      ("SELECT doc_id, " +
        "trim(regexp_replace(regexp_replace(lower(text), '[\\x00-\\x1f\\x7f]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm, " +
        "trim(regexp_replace(regexp_replace(regexp_replace(lower(text), '[\\x00-\\x1f\\x7f]', ' ', 'g'), " +
        "'[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm_nopunct FROM documents"),
    // batch equivalent of the stream-static broadcast join; per-row
    // floor(value*100) makes the double sum integer-exact cross-engine
    "stream_static_join" ->
      ("SELECT c_mktsegment, count(*)::BIGINT AS n, " +
        "sum(floor(value * 100)::BIGINT)::BIGINT AS value_x100 " +
        "FROM events JOIN customer ON user_id = c_custkey GROUP BY 1 ORDER BY 1"),
    // full per-chunk value compare: same tokenize, same stride-24 starts,
    // same keep-if-new-tokens filter (s=1 or s<=n-8), same 32-token slices
    "chunk_docs" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE text IS NOT NULL), " +
        "st AS (SELECT doc_id, t, list_filter(range(1, len(t) + 1, 24), s -> s = 1 OR s <= len(t) - 8) AS starts FROM toks), " +
        "c AS (SELECT doc_id, unnest(range(1, len(starts) + 1)) AS k, t, starts FROM st) " +
        "SELECT doc_id, (k - 1)::BIGINT AS chunk_idx, len(t[starts[k]:starts[k] + 31])::BIGINT AS n_tokens, " +
        "array_to_string(t[starts[k]:starts[k] + 31], ' ') AS chunk_text FROM c"),
    // exact-jaccard pair graph (as dedup_components) -> component key ->
    // the same 2^32-ring hash assignment; cutoffs are cutoff(9000)/
    // cutoff(9500) as Long arithmetic (bp * 2^32 / 10000, floor)
    "cluster_split" ->
      ("WITH sh AS (SELECT doc_id, list_distinct([text[i:i+4] FOR i IN range(1, greatest(len(text)-3, 1))]) AS s FROM documents), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.s, b.s))::DOUBLE / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id), " +
        "e AS (SELECT id_a AS a, id_b AS b FROM p WHERE j >= 0.8 UNION SELECT id_b, id_a FROM p WHERE j >= 0.8), " +
        "reach AS (WITH RECURSIVE r(a, b) AS (SELECT a, b FROM e " +
        "UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a WHERE r.a <> e.b) SELECT * FROM r), " +
        "comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a), " +
        "k AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS key FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id), " +
        "asn AS (SELECT doc_id, key, CASE WHEN (key::HUGEINT * 2654435761) % 4294967296 < 3865470566 THEN 'train' " +
        "WHEN (key::HUGEINT * 2654435761) % 4294967296 < 4080218931 THEN 'val' ELSE 'test' END AS split FROM k) " +
        "SELECT split, count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum, " +
        "count(DISTINCT key)::BIGINT AS n_keys FROM asn GROUP BY split ORDER BY split"),
    // same CC + assignment CTEs as cluster_split, extended with the naive
    // id-hash split; n_leaky_stable = 0 is the oracle-asserted guarantee
    "split_leakage" ->
      ("WITH sh AS (SELECT doc_id, list_distinct([text[i:i+4] FOR i IN range(1, greatest(len(text)-3, 1))]) AS s FROM documents), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.s, b.s))::DOUBLE / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id), " +
        "e AS (SELECT id_a AS a, id_b AS b FROM p WHERE j >= 0.8 UNION SELECT id_b, id_a FROM p WHERE j >= 0.8), " +
        "reach AS (WITH RECURSIVE r(a, b) AS (SELECT a, b FROM e " +
        "UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a WHERE r.a <> e.b) SELECT * FROM r), " +
        "comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a), " +
        "k AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS key FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id), " +
        "asn AS (SELECT doc_id, CASE WHEN (key::HUGEINT * 2654435761) % 4294967296 < 3865470566 THEN 'train' " +
        "WHEN (key::HUGEINT * 2654435761) % 4294967296 < 4080218931 THEN 'val' ELSE 'test' END AS split FROM k), " +
        "nv AS (SELECT doc_id, CASE WHEN (doc_id::HUGEINT * 2654435761) % 4294967296 < 3865470566 THEN 'train' " +
        "WHEN (doc_id::HUGEINT * 2654435761) % 4294967296 < 4080218931 THEN 'val' ELSE 'test' END AS naive FROM documents), " +
        "pp AS (SELECT id_a, id_b FROM p WHERE j >= 0.8), " +
        "lk AS (SELECT pp.id_a, pp.id_b, na.naive AS sa, nb.naive AS sb, ca.split AS ta, cb.split AS tb " +
        "FROM pp JOIN nv na ON na.doc_id = pp.id_a JOIN nv nb ON nb.doc_id = pp.id_b " +
        "JOIN asn ca ON ca.doc_id = pp.id_a JOIN asn cb ON cb.doc_id = pp.id_b) " +
        "SELECT count(*)::BIGINT AS n_pairs, " +
        "count(CASE WHEN sa <> sb THEN 1 END)::BIGINT AS n_leaky_naive, " +
        "coalesce(sum(CASE WHEN sa <> sb THEN id_a + id_b END), 0)::BIGINT AS leaky_id_sum, " +
        "count(CASE WHEN ta <> tb THEN 1 END)::BIGINT AS n_leaky_stable FROM lk"),
    "skew_join_agg" ->
      ("SELECT c_mktsegment, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1"),
    "dedup_ngram" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "g AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, greatest(len(t)-1, 1))]) AS gr FROM toks), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.gr, b.gr))::DOUBLE / (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))) AS j " +
        "FROM g a JOIN g b ON a.doc_id < b.doc_id) " +
        "SELECT count(*) AS n_pairs, coalesce(sum(id_a + id_b), 0)::BIGINT AS pair_id_sum FROM p WHERE j >= 0.3"),
    "dedup_ngram_hot" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "g AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, greatest(len(t)-1, 1))]) AS gr FROM toks), " +
        "inv AS (SELECT doc_id, unnest(gr) AS gram FROM g), " +
        "dfc AS (SELECT gram, count(*) AS df FROM inv GROUP BY gram) " +
        "SELECT count(*)::BIGINT AS n_hot, coalesce(max(df), 0)::BIGINT AS max_df, " +
        "coalesce(sum(df), 0)::BIGINT AS hot_gram_docs FROM dfc WHERE df > 5"),
    // full per-document recompute: window occurrence counts -> covered
    // token indices -> gaps-and-islands span merge -> clean-text rebuild
    "dedup_spans" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents WHERE text IS NOT NULL), " +
        "wl AS (SELECT doc_id, [{'pos': i - 1, 'gram': array_to_string(t[i:i+7], ' ')} FOR i IN range(1, greatest(len(t) - 6, 1))] AS ws FROM toks), " +
        "w AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM wl, unnest(ws) AS s(u)), " +
        "occ AS (SELECT gram FROM w GROUP BY gram HAVING count(*) > 1), " +
        "d AS (SELECT w.doc_id, w.pos FROM w JOIN occ USING (gram)), " +
        "cov AS (SELECT DISTINCT doc_id, pos + j AS idx FROM d, range(0, 8) r(j)), " +
        "isl AS (SELECT doc_id, idx, idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS grp FROM cov), " +
        "stats AS (SELECT doc_id, count(DISTINCT grp)::BIGINT AS n_spans, count(*)::BIGINT AS tokens_removed FROM isl GROUP BY doc_id), " +
        "tp AS (SELECT doc_id, u.i AS i, u.tok AS tok FROM (SELECT doc_id, [{'i': i - 1, 'tok': t[i]} FOR i IN range(1, len(t) + 1)] AS pairs FROM toks), unnest(pairs) AS s(u)), " +
        "kept AS (SELECT tp.doc_id, string_agg(tp.tok, ' ' ORDER BY tp.i) AS clean_text " +
        "FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.i = cov.idx " +
        "WHERE cov.idx IS NULL GROUP BY tp.doc_id) " +
        "SELECT t.doc_id, len(t.t)::BIGINT AS n_tokens, coalesce(s.n_spans, 0)::BIGINT AS n_spans, " +
        "coalesce(s.tokens_removed, 0)::BIGINT AS tokens_removed, coalesce(k.clean_text, '') AS clean_text " +
        "FROM toks t LEFT JOIN stats s USING (doc_id) LEFT JOIN kept k USING (doc_id)"),
    // exhaustive length-windowed levenshtein sweep as ground truth for the
    // prefix-filtered similarity join
    "edit_pairs" ->
      ("WITH u AS (SELECT doc_id, text FROM documents UNION ALL " +
        "SELECT doc_id + 1000000000000, concat(substr(text, 1, 5), '#', substr(text, 7)) " +
        "FROM documents WHERE doc_id % 10 = 0), " +
        "p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, levenshtein(a.text, b.text) AS dist " +
        "FROM u a JOIN u b ON a.doc_id < b.doc_id " +
        "AND abs(length(a.text) - length(b.text)) <= 2) " +
        "SELECT count(*)::BIGINT AS n_pairs, coalesce(sum(ia + ib), 0)::BIGINT AS pair_id_sum, " +
        "coalesce(sum(dist), 0)::BIGINT AS dist_sum FROM p WHERE dist <= 2"),
    // ground truth by direct null-safe value comparison (vs the operator's
    // fingerprint-only comparison)
    "snapshot_diff" ->
      ("WITH v1 AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 11 != 3), " +
        "v2 AS (SELECT doc_id, CASE WHEN doc_id % 17 = 2 THEN text || ' v2' ELSE text END AS text, " +
        "CASE WHEN doc_id % 19 = 7 THEN NULL ELSE lang END AS lang FROM documents WHERE doc_id % 13 != 5), " +
        "d AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, " +
        "CASE WHEN a.doc_id IS NULL THEN 'added' WHEN b.doc_id IS NULL THEN 'removed' " +
        "WHEN a.text IS NOT DISTINCT FROM b.text AND a.lang IS NOT DISTINCT FROM b.lang " +
        "THEN 'unchanged' ELSE 'changed' END AS status " +
        "FROM v1 a FULL JOIN v2 b ON a.doc_id = b.doc_id) " +
        "SELECT status, count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum " +
        "FROM d WHERE status <> 'unchanged' GROUP BY status"),
    // the identical strip chain (RE2-safe patterns, same entity order,
    // &amp; last) replayed over the same synthetic HTML shell
    "text_strip_html" ->
      ("WITH h AS (SELECT doc_id, " +
        "'<html><head><style type=\"text/css\">p { color: red; }</style>" +
        "<script>var x = 1 < 2;</script></head><body><!-- id: ' || doc_id::VARCHAR || " +
        "' --><h1>Doc &amp; &quot;friends&quot;</h1><p>' || text || " +
        "'</p><p>tail &lt;x&gt; &nbsp;end</p></body></html>' AS html FROM documents), " +
        "s AS (SELECT doc_id, trim(regexp_replace(" +
        "replace(replace(replace(replace(replace(replace(" +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(html, " +
        "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), " +
        "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), " +
        "'(?s)<!--.*?-->', ' ', 'g'), " +
        "'<[^>]+>', ' ', 'g'), " +
        "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), " +
        "'&nbsp;', ' '), '&amp;', '&'), " +
        "'\\s+', ' ', 'g')) AS clean FROM h) " +
        "SELECT doc_id, clean, length(clean)::BIGINT AS n_chars FROM s"),
    // exact per-group counts + the pinned all-pass contract verdict
    // (values themselves are sketch-dependent; the contract is not)
    "group_percentiles" ->
      ("WITH g AS (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source) " +
        "SELECT g.source, t.q::BIGINT AS q, g.n, 1::BIGINT AS ok, 1::BIGINT AS ok_member " +
        "FROM g CROSS JOIN (SELECT unnest([25, 50, 95]) AS q) t"),
    // same fixture, per-annotator view: agreement with the reconciled
    // majority, ties excluded on both sides
    "annotator_report" ->
      ("WITH v AS (" +
        "SELECT doc_id, 0::BIGINT AS annotator, lang AS label FROM documents " +
        "UNION ALL SELECT doc_id, 1, CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END FROM documents " +
        "UNION ALL SELECT doc_id, 2, CASE WHEN doc_id % 21 = 0 THEN 'xx' " +
        "WHEN doc_id % 13 = 0 THEN 'yy' ELSE lang END FROM documents), " +
        "c AS (SELECT doc_id, label, count(*)::BIGINT AS n FROM v GROUP BY doc_id, label), " +
        "t AS (SELECT *, max(n) OVER (PARTITION BY doc_id) AS top_n FROM c), " +
        "m AS (SELECT doc_id, min(CASE WHEN n = top_n THEN label END) AS maj, " +
        "sum(CASE WHEN n = top_n THEN 1 ELSE 0 END) AS n_top FROM t GROUP BY doc_id), " +
        "j AS (SELECT v.annotator, CASE WHEN v.label IS NOT DISTINCT FROM m.maj THEN 1 ELSE 0 END AS hit " +
        "FROM v JOIN m ON v.doc_id = m.doc_id WHERE m.n_top = 1) " +
        "SELECT annotator, count(*)::BIGINT AS n_votes, sum(hit)::BIGINT AS n_majority, " +
        "((sum(hit) * 10000) // count(*))::BIGINT AS majority_x1e4 FROM j GROUP BY annotator")
  )

}
