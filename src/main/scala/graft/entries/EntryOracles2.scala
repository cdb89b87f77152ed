package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.MaskTransform

/** DuckDB oracle SQL, part 2 of 2 (split from SparkEntry — r16 #6). */
private[graft] trait EntryOracles2 { this: EntryCore =>

  /** Shared by `feed_frontier` and its streaming twin
    * `stream_feed_poll`. */
  private val feedFrontierOracleSql: String =
    "WITH e AS (SELECT 'news-' || (doc_id % 20) || '.example.com' AS host, " +
      "CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind, " +
      "1781517600 + (doc_id % 60) * 60 AS epoch FROM documents " +
      "UNION ALL SELECT 'news-' || ((doc_id + 7) % 20) || '.example.com', " +
      "CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END, " +
      "1781517600 + ((doc_id + 13) % 60) * 60 FROM documents) " +
      "SELECT host, count(*)::BIGINT AS n_entries, " +
      "sum(CASE WHEN kind = 'rss' THEN 1 ELSE 0 END)::BIGINT AS n_rss, " +
      "sum(CASE WHEN kind = 'atom' THEN 1 ELSE 0 END)::BIGINT AS n_atom, " +
      "sum(epoch)::BIGINT AS sum_epoch, 0::BIGINT AS n_bad_epoch " +
      "FROM e GROUP BY host"

  /** Shared by `cdc_incremental` and its streaming twin
    * `stream_cdc_ingest` (the contract is batching-invariant). */
  private def cdcIncrementalOracleSql(where: String): String =
    "SELECT sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_day0_docs, " +
      "count(*)::BIGINT AS n_batch_docs, 0::BIGINT AS n_novel_from_rearrived, " +
      "1::BIGINT AS has_novel, 1::BIGINT AS novel_bytes_le_new, " +
      "0::BIGINT AS n_novel_after_ingest FROM documents" + where

  private[graft] def oracleSqlPart2: Map[String, String] = Map(
    // the feed XML is BUILT from id arithmetic and must round-trip
    // through the real RSS/Atom parser: links, kinds, and RFC 1123 /
    // RFC 3339 epochs all replay here without parsing any XML; a
    // date-parse bug surfaces as n_bad_epoch > 0 or a wrong sum_epoch
    "feed_frontier" -> feedFrontierOracleSql,
    // the streaming twin shares the oracle VERBATIM: trigger machinery
    // must not change one count
    "stream_feed_poll" -> feedFrontierOracleSql,
    // every count replays from the four-arm arithmetic; the decoy arms
    // (rel=alternate type=text/html, rel=stylesheet, linkless)
    // contributing ZERO is the load-bearing discrimination
    "feed_autodiscovery" ->
      ("SELECT count(*)::BIGINT AS n_pages, " +
        "(sum(CASE WHEN doc_id % 4 = 0 THEN 1 WHEN doc_id % 4 = 1 THEN 2 ELSE 0 END))::BIGINT AS n_feed_links, " +
        "sum(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_rel_resolved, " +
        "sum(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_abs_rss, " +
        "sum(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_abs_atom, " +
        "0::BIGINT AS n_from_decoy_arms FROM documents"),
    // brute-force replay of the ratio margin over both k-NN
    // neighborhoods; ids and ranks only (ordering contract, not float
    // equality), embeddings cast to double like every ANN oracle
    "bitext_margin_mine" ->
      ("WITH src AS (SELECT vec_id AS sid, list_transform(embedding, x -> x::DOUBLE) AS e " +
        "FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 400), " +
        "tgt AS (SELECT vec_id AS tid, list_transform(embedding, x -> x::DOUBLE) AS e " +
        "FROM embeddings WHERE vec_id % 2 = 1), " +
        "x AS (SELECT sid, tid, list_cosine_similarity(src.e, tgt.e) AS c FROM src CROSS JOIN tgt), " +
        "fk AS (SELECT sid, avg(c) AS f FROM (SELECT sid, c, " +
        "row_number() OVER (PARTITION BY sid ORDER BY c DESC, tid) AS rn FROM x) WHERE rn <= 4 GROUP BY sid), " +
        "bk AS (SELECT tid, avg(c) AS b FROM (SELECT tid, c, " +
        "row_number() OVER (PARTITION BY tid ORDER BY c DESC, sid) AS rn FROM x) WHERE rn <= 4 GROUP BY tid), " +
        "cand AS (SELECT sid, tid, c FROM (SELECT sid, tid, c, " +
        "row_number() OVER (PARTITION BY sid ORDER BY c DESC, tid) AS rn FROM x) WHERE rn <= 4), " +
        "m AS (SELECT cand.sid, cand.tid, cand.c / ((fk.f + bk.b) / 2) AS margin FROM cand " +
        "JOIN fk ON cand.sid = fk.sid JOIN bk ON cand.tid = bk.tid), " +
        "best AS (SELECT sid, tid, margin, row_number() OVER (PARTITION BY sid " +
        "ORDER BY margin DESC, tid) AS rn FROM m) " +
        "SELECT sid AS src_id, tid AS tgt_id, " +
        "row_number() OVER (ORDER BY margin DESC, sid)::BIGINT AS rank " +
        "FROM best WHERE rn = 1"),
    // the streaming twin shares the pinned contract VERBATIM: the
    // invariants are batching-invariant by construction
    "stream_cdc_ingest" -> cdcIncrementalOracleSql(" WHERE doc_id % 4 = 1"),
    // keep-newest capture: winner ids and dates replay from the
    // permalink-date arithmetic; ISO strings order chronologically
    "dated_dedup" ->
      ("WITH d AS (SELECT doc_id AS id, doc_id // 3 AS grp, " +
        "(2010 + doc_id % 10) || '-' || lpad((1 + doc_id % 12)::VARCHAR, 2, '0') " +
        "|| '-' || lpad((1 + doc_id % 28)::VARCHAR, 2, '0') AS pub_date FROM documents), " +
        "m AS (SELECT grp, count(*)::BIGINT AS n_captures, max(pub_date) AS kept_date " +
        "FROM d GROUP BY grp) " +
        "SELECT m.grp, m.n_captures, m.kept_date, min(d.id)::BIGINT AS kept_id " +
        "FROM m JOIN d ON d.grp = m.grp AND d.pub_date = m.kept_date " +
        "GROUP BY m.grp, m.n_captures, m.kept_date"),
    // pinned store-exactness contract: re-arrived docs contribute ZERO
    // novel chunks, a re-probe after ingest finds ZERO novel, novel
    // bytes bounded by the new docs' bytes; doc counts arithmetic
    "cdc_incremental" -> cdcIncrementalOracleSql(""),
    // ladder arms replay from id arithmetic; the meta/time arms carry a
    // valid DECOY url date the ladder must not return, so src order is
    // load-bearing in the hash
    "page_dates" ->
      ("SELECT doc_id, CASE (doc_id % 4) WHEN 0 THEN 'meta' WHEN 1 THEN 'time' " +
        "WHEN 2 THEN 'url' ELSE NULL END AS date_src, " +
        "CASE WHEN (doc_id % 4) <= 2 THEN (2000 + doc_id % 20) || '-' || " +
        "lpad((1 + doc_id % 12)::VARCHAR, 2, '0') || '-' || " +
        "lpad((1 + doc_id % 28)::VARCHAR, 2, '0') ELSE NULL END AS pub_date " +
        "FROM documents"),
    // both directive channels replay by arm: meta via the html kernel,
    // header via the real HTTP head parser; noindex from EITHER channel
    // excludes, nofollow only flags
    "noindex_filter" ->
      ("SELECT doc_id, CASE (doc_id % 5) WHEN 1 THEN 'noindex, follow' " +
        "WHEN 3 THEN 'nofollow' ELSE NULL END AS meta_robots, " +
        "CASE (doc_id % 5) WHEN 2 THEN 'noindex' WHEN 4 THEN 'all' ELSE NULL END AS hdr_robots, " +
        "(doc_id % 5) IN (1, 2) AS noindex, " +
        "(doc_id % 5) = 3 AS nofollow, " +
        "(doc_id % 5) NOT IN (1, 2) AS kept " +
        "FROM documents"),
    // full-value from first principles: the six expected sentences are
    // CONSTRUCTED from (text, lang, source), not replayed through the
    // regex chain — abbreviation/decimal periods must stay inside their
    // sentences, CJK must split with no whitespace, the unterminated
    // tail must still be a sentence
    "sentence_split" ->
      ("WITH c AS (SELECT doc_id, text, lang, source FROM documents) " +
        "SELECT doc_id, 0::BIGINT AS sentence_idx, " +
        "'Intro words ' || substr(text, 1, 40) || '.' AS sentence FROM c " +
        "UNION ALL SELECT doc_id, 1::BIGINT, 'Dr. Smith replied to Mrs. Jones!' FROM c " +
        "UNION ALL SELECT doc_id, 2::BIGINT, 'Was it version 3.14 of ' || lang || '?' FROM c " +
        "UNION ALL SELECT doc_id, 3::BIGINT, '句子一。' FROM c " +
        "UNION ALL SELECT doc_id, 4::BIGINT, '这是第二句！' FROM c " +
        "UNION ALL SELECT doc_id, 5::BIGINT, 'Tail from ' || source || ' e.g. the end' FROM c"),
    // construction arithmetic: the slogan sentence collides on doc_id%7
    // (~n/7 copies each) and 'Dr. Smith replied.' collides corpus-wide,
    // so exactly the two doc_id-bearing sentences survive per document
    "sentence_dedup" ->
      ("SELECT doc_id, 2::BIGINT AS n_kept, " +
        "'Unique lead ' || substr(text, 1, 30) || ' of doc ' || doc_id || '. " +
        "Tail source ' || source || ' closes doc ' || doc_id || '.' AS kept_text " +
        "FROM documents"),
    // language from the planted-prefix arm (the Spark side must DETECT
    // it — profile-ranker green is load-bearing for ru/zh/ar); score
    // replays the lm_score bigram construction over the composed text;
    // tertiles replay the histogram-cutoff rule with the same integer
    // arithmetic
    "lm_quality_buckets" ->
      ("WITH c AS (SELECT doc_id, CASE (doc_id % 4) " +
        "WHEN 0 THEN 'the quick brown fox jumps over the lazy dog near the river bank today' " +
        "WHEN 1 THEN 'в этом документе говорится о последних новостях и погоде в москве сегодня вечером' " +
        "WHEN 2 THEN '这是一个关于新闻和天气的中文文档今天晚上在北京发布的内容' " +
        "ELSE 'هذه وثيقة باللغة العربية عن الأخبار والطقس في المساء اليوم' END " +
        "|| ' ' || substr(text, 1, 40) AS t FROM documents), " +
        "toks AS (SELECT doc_id, string_split_regex(lower(trim(t)), '\\s+') AS t FROM c), " +
        "uni AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w), " +
        "bg AS (SELECT bgk, count(*) AS c2 FROM (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bgk " +
        "FROM toks WHERE len(t) >= 2) GROUP BY bgk), " +
        "v AS (SELECT count(*)::DOUBLE AS v FROM uni), " +
        "e AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS b FROM " +
        "(SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2)), " +
        "s AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams, " +
        "floor(avg(ln((coalesce(c2, 0) + 0.5) / (coalesce(c1, 0) + 0.5 * v))) * 10000 + 0.000001)::BIGINT AS sc " +
        "FROM e LEFT JOIN bg ON e.b = bg.bgk LEFT JOIN uni ON e.w1 = uni.w CROSS JOIN v GROUP BY doc_id), " +
        "l AS (SELECT doc_id, CASE (doc_id % 4) WHEN 0 THEN 'en' WHEN 1 THEN 'ru' " +
        "WHEN 2 THEN 'zh' ELSE 'ar' END AS lang FROM documents), " +
        "pd AS (SELECT l.doc_id, l.lang, s.n_bigrams, s.sc FROM l JOIN s ON l.doc_id = s.doc_id), " +
        "h AS (SELECT lang, sc, count(*)::BIGINT AS cnt FROM pd GROUP BY lang, sc), " +
        "cut AS (SELECT lang, sc, " +
        "sum(cnt) OVER (PARTITION BY lang ORDER BY sc DESC ROWS UNBOUNDED PRECEDING) - cnt AS start, " +
        "sum(cnt) OVER (PARTITION BY lang) AS n FROM h), " +
        "b AS (SELECT lang, sc, CASE WHEN start < floor((n + 2) / 3.0) THEN 'head' " +
        "WHEN start < floor((n * 2 + 2) / 3.0) THEN 'middle' ELSE 'tail' END AS bucket FROM cut) " +
        "SELECT pd.doc_id, pd.lang, pd.n_bigrams, pd.sc AS avg_logp_x1e4, b.bucket " +
        "FROM pd JOIN b ON pd.lang = b.lang AND pd.sc = b.sc"),
    // pinned contract: byte totals from id arithmetic; partition/bounds/
    // roundtrip laws zero-violation; 4 suffix families -> 4 distinct
    // tail-chunk hashes (within-family chunking must RESYNC after the
    // unique prefix); chunk-level dedup saves >half the corpus bytes
    "cdc_chunking" ->
      ("SELECT count(*)::BIGINT AS n_docs, " +
        "sum(64 + (doc_id % 257) + 3 * 8192)::BIGINT AS total_bytes, " +
        "0::BIGINT AS over_max, 0::BIGINT AS under_min_nonlast, " +
        "0::BIGINT AS roundtrip_violations, 4::BIGINT AS n_distinct_tail_hash, " +
        "1::BIGINT AS dedup_saved_ge_half, 1::BIGINT AS avg_size_in_range " +
        "FROM documents"),
    // the FULL interpolated-KN construction replayed: train split,
    // tri/bi counts, continuation counts, unigram continuation, D=0.75
    // interpolation down to the uniform 1/Vhat floor, the 1e4 log grid
    "lm_kn_score" ->
      ("WITH c AS (SELECT doc_id, substr(text, 1, 60) || ' ' || CASE (doc_id % 4) " +
        "WHEN 0 THEN 'alpha beta gamma' WHEN 1 THEN 'alpha beta r' || doc_id " +
        "WHEN 2 THEN 'delta epsilon' ELSE '' END AS t FROM documents), " +
        "ttoks AS (SELECT string_split_regex(lower(trim(t)), '\\s+') AS t FROM c WHERE doc_id % 3 <> 0), " +
        "tripos AS (SELECT t[i] || ' ' || t[i+1] AS ctx, t[i+2] AS w3 FROM " +
        "(SELECT t, unnest(range(1, len(t) - 1)) AS i FROM ttoks WHERE len(t) >= 3)), " +
        "tri AS (SELECT ctx, w3, count(*) AS c3 FROM tripos GROUP BY ctx, w3), " +
        "bi AS (SELECT ctx, sum(c3) AS c2, count(*) AS t3 FROM tri GROUP BY ctx), " +
        "cont AS (SELECT split_part(ctx, ' ', 2) AS w2, w3, count(*) AS cc FROM tri GROUP BY 1, 2), " +
        "contagg AS (SELECT w2, sum(cc) AS cc2, count(*) AS t2 FROM cont GROUP BY w2), " +
        "bitypes AS (SELECT DISTINCT t[i] AS w1, t[i+1] AS w2 FROM " +
        "(SELECT t, unnest(range(1, len(t))) AS i FROM ttoks WHERE len(t) >= 2)), " +
        "unicont AS (SELECT w2 AS w, count(*) AS n1p FROM bitypes GROUP BY w2), " +
        "consts AS (SELECT (SELECT sum(n1p)::DOUBLE FROM unicont) AS btypes, " +
        "(SELECT count(*)::DOUBLE FROM unicont) AS u, " +
        "(SELECT count(DISTINCT w)::DOUBLE FROM (SELECT unnest(t) AS w FROM ttoks)) + 1.0 AS vhat), " +
        "stoks AS (SELECT doc_id, string_split_regex(lower(trim(t)), '\\s+') AS t FROM c), " +
        "spos AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS ctx, t[i+1] AS w2, t[i+2] AS w3 FROM " +
        "(SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM stoks WHERE len(t) >= 3)), " +
        "j AS (SELECT s.doc_id, tri.c3, bi.c2, bi.t3, cont.cc, ca.cc2, ca.t2, uc.n1p, " +
        "k.btypes, k.u, k.vhat FROM spos s " +
        "LEFT JOIN tri ON s.ctx = tri.ctx AND s.w3 = tri.w3 " +
        "LEFT JOIN bi ON s.ctx = bi.ctx " +
        "LEFT JOIN cont ON s.w2 = cont.w2 AND s.w3 = cont.w3 " +
        "LEFT JOIN contagg ca ON s.w2 = ca.w2 " +
        "LEFT JOIN unicont uc ON s.w3 = uc.w CROSS JOIN consts k), " +
        "j2 AS (SELECT doc_id, c3, c2, t3, cc, cc2, t2, " +
        "greatest(coalesce(n1p, 0)::DOUBLE - 0.75, 0) / btypes + 0.75 * u / btypes / vhat AS p1 FROM j), " +
        "j3 AS (SELECT doc_id, c3, c2, t3, CASE WHEN cc2 IS NULL THEN p1 ELSE " +
        "greatest(coalesce(cc, 0)::DOUBLE - 0.75, 0) / cc2::DOUBLE + 0.75 * t2::DOUBLE / cc2::DOUBLE * p1 END AS p2 FROM j2), " +
        "j4 AS (SELECT doc_id, CASE WHEN c2 IS NULL THEN p2 ELSE " +
        "greatest(coalesce(c3, 0)::DOUBLE - 0.75, 0) / c2::DOUBLE + 0.75 * t3::DOUBLE / c2::DOUBLE * p2 END AS p3 FROM j3), " +
        "s2 AS (SELECT doc_id, count(*)::BIGINT AS n_trigrams, " +
        "floor(avg(ln(p3)) * 10000 + 0.000001)::BIGINT AS avg_logp_x1e4 FROM j4 GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(s2.n_trigrams, 0)::BIGINT AS n_trigrams, " +
        "coalesce(s2.avg_logp_x1e4, 0)::BIGINT AS avg_logp_x1e4 " +
        "FROM documents d LEFT JOIN s2 ON d.doc_id = s2.doc_id"),
    // every feature integer replays from the five-arm construction with
    // the same string builtins (shared Java-regex/RE2 dialect)
    "url_spam_score" ->
      ("WITH u AS (SELECT doc_id, CASE (doc_id % 5) " +
        "WHEN 0 THEN 'https://news.example.com/articles/' || doc_id " +
        "WHEN 1 THEN 'https://example.com/p/' || doc_id || '?utm_source=feed&fbclid=x' || doc_id || '&ref=tw' " +
        "WHEN 2 THEN 'http://best-cheap-pills-' || (doc_id % 7) || '.win-prizes-online.example.biz/offer/' || doc_id " +
        "WHEN 3 THEN 'https://example.org/a/b/c/d/e/f/g/h/' || doc_id || '/page' " +
        "ELSE 'http://h' || doc_id || 'x' || ((doc_id * 7) % 1000) || '.example.net/' || doc_id END AS url " +
        "FROM documents), " +
        "f AS (SELECT doc_id, url, " +
        "regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host, " +
        "regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path, " +
        "regexp_extract(url, '\\?([^#]*)', 1) AS query FROM u), " +
        "g AS (SELECT doc_id, url, host, " +
        "greatest(len(string_split(host, '.')) - 2, 0)::BIGINT AS n_sub, " +
        "(len(host) - len(replace(host, '-', '')))::BIGINT AS n_hyphen, " +
        "floor((len(host) - len(regexp_replace(host, '[0-9]', '', 'g'))) * 100.0 / len(host))::BIGINT AS digit_pct, " +
        "(CASE WHEN len(path) = 0 THEN 0 ELSE len(string_split(path, '/')) - 1 END)::BIGINT AS path_depth, " +
        "(CASE WHEN len(query) = 0 THEN 0 ELSE len(string_split(query, '&')) END)::BIGINT AS n_params, " +
        "len(regexp_extract_all(query, '(^|&)(utm_[a-z]+|fbclid|gclid|msclkid|ref)='))::BIGINT AS n_tracking " +
        "FROM f) " +
        "SELECT doc_id, url, host, n_sub, n_hyphen, digit_pct, path_depth, n_params, n_tracking, " +
        "(3 * n_hyphen + 2 * n_sub + (digit_pct // 10) + 2 * greatest(path_depth - 4, 0) " +
        "+ greatest(n_params - 2, 0) + 4 * n_tracking " +
        "+ CASE WHEN len(host) > 40 THEN 5 ELSE 0 END " +
        "+ CASE WHEN regexp_matches(host, '\\.(biz|win|top|loan|click)$') THEN 6 ELSE 0 END)::BIGINT AS spam_score " +
        "FROM g"),
    // the same three synthetic annotators, reconciled with window SQL:
    // same majority, same lexicographic tie-break, same integer agreement
    "label_vote" ->
      ("WITH v AS (" +
        "SELECT doc_id, lang AS label FROM documents " +
        "UNION ALL SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END FROM documents " +
        "UNION ALL SELECT doc_id, CASE WHEN doc_id % 21 = 0 THEN 'xx' " +
        "WHEN doc_id % 13 = 0 THEN 'yy' ELSE lang END FROM documents), " +
        "c AS (SELECT doc_id, label, count(*)::BIGINT AS n FROM v GROUP BY doc_id, label), " +
        "t AS (SELECT *, max(n) OVER (PARTITION BY doc_id) AS top_n FROM c) " +
        "SELECT doc_id, min(CASE WHEN n = top_n THEN label END) AS label, " +
        "sum(n)::BIGINT AS n_votes, count(*)::BIGINT AS n_labels, " +
        "max(top_n)::BIGINT AS top_n, " +
        "sum(CASE WHEN n = top_n THEN 1 ELSE 0 END)::BIGINT AS n_top, " +
        "((max(top_n) * 10000) // sum(n))::BIGINT AS agreement_x1e4 " +
        "FROM t GROUP BY doc_id"),
    // identical lag window (ts micros, event_id tie-break) and integer
    // per-origin share
    "event_transitions" ->
      ("WITH o AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, " +
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type " +
        "FROM events), " +
        "p AS (SELECT event_type AS prev_type, next_type, count(*)::BIGINT AS n " +
        "FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2) " +
        "SELECT prev_type, next_type, n, " +
        "((n * 10000) // (sum(n) OVER (PARTITION BY prev_type)))::BIGINT AS share_x1e4 FROM p"),
    // identical integer idf ((1000*N) // df), identical whitespace
    // tokenization, identical (score desc, token asc) tie-break
    "keyword_tfidf" ->
      ("WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL), " +
        "t AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM d), " +
        "tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM t WHERE tok <> '' GROUP BY doc_id, tok), " +
        "dfr AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok), " +
        "n AS (SELECT count(*)::BIGINT AS n_docs FROM d), " +
        "s AS (SELECT tf.doc_id, tf.tok, tf.tf, dfr.df, " +
        "tf.tf * ((1000 * n.n_docs) // dfr.df) AS score " +
        "FROM tf JOIN dfr USING (tok) CROSS JOIN n), " +
        "r AS (SELECT s.*, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rnk FROM s) " +
        "SELECT doc_id, rnk::BIGINT AS rnk, tok, tf, df, score FROM r WHERE rnk <= 3"),
    // SCD2 merge recomputed with direct IS DISTINCT FROM logic: close the
    // open row of every key whose incoming image differs, insert the new
    // image, pass history and no-ops through verbatim
    "scd2_merge" ->
      ("WITH dim AS (" +
        "SELECT doc_id, 'old ' || text AS text, lang, 0::BIGINT AS valid_from, 100::BIGINT AS valid_to " +
        "FROM documents WHERE doc_id % 5 = 0 " +
        "UNION ALL " +
        "SELECT doc_id, text, lang, (CASE WHEN doc_id % 5 = 0 THEN 100 ELSE 0 END)::BIGINT, NULL::BIGINT " +
        "FROM documents), " +
        "ch AS (" +
        "SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN text ELSE text || ' r2' END AS text, " +
        "CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang " +
        "FROM documents WHERE doc_id % 7 = 0 " +
        "UNION ALL " +
        "SELECT doc_id + 5000000000000, text, lang FROM documents WHERE doc_id % 50 = 0), " +
        "cur AS (SELECT * FROM dim WHERE valid_to IS NULL), " +
        "amended AS (" +
        "SELECT d.doc_id, d.text, d.lang, d.valid_from, " +
        "CASE WHEN d.valid_to IS NULL AND c.doc_id IS NOT NULL " +
        "AND (d.text IS DISTINCT FROM c.text OR d.lang IS DISTINCT FROM c.lang) " +
        "THEN 200 ELSE d.valid_to END AS valid_to " +
        "FROM dim d LEFT JOIN ch c ON d.doc_id = c.doc_id AND d.valid_to IS NULL), " +
        "ins AS (" +
        "SELECT c.doc_id, c.text, c.lang, 200::BIGINT AS valid_from, NULL::BIGINT AS valid_to " +
        "FROM ch c LEFT JOIN cur ON c.doc_id = cur.doc_id " +
        "WHERE cur.doc_id IS NULL OR c.text IS DISTINCT FROM cur.text OR c.lang IS DISTINCT FROM cur.lang), " +
        "m AS (SELECT * FROM amended UNION ALL SELECT * FROM ins) " +
        "SELECT valid_from, coalesce(valid_to, -1)::BIGINT AS valid_to_n, " +
        "count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum, " +
        "sum(length(text))::BIGINT AS len_sum, " +
        "sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_langs " +
        "FROM m GROUP BY 1, 2"),
    // provenance split from the diff + scores from a fresh score(v2):
    // the incremental result must be indistinguishable from full recompute
    "incremental_score" ->
      ("WITH v1 AS (SELECT doc_id, text, lang FROM documents WHERE doc_id % 11 != 3), " +
        "v2 AS (SELECT doc_id, CASE WHEN doc_id % 17 = 2 THEN text || ' v2' ELSE text END AS text, " +
        "CASE WHEN doc_id % 19 = 7 THEN NULL ELSE lang END AS lang FROM documents WHERE doc_id % 13 != 5), " +
        "d AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, " +
        "CASE WHEN a.doc_id IS NULL THEN 'added' WHEN b.doc_id IS NULL THEN 'removed' " +
        "WHEN a.text IS NOT DISTINCT FROM b.text AND a.lang IS NOT DISTINCT FROM b.lang " +
        "THEN 'unchanged' ELSE 'changed' END AS status " +
        "FROM v1 a FULL JOIN v2 b ON a.doc_id = b.doc_id), " +
        "s AS (SELECT d.doc_id, CASE WHEN d.status = 'unchanged' THEN 'carried' ELSE 'recomputed' END AS provenance, " +
        "b.text FROM d JOIN v2 b ON d.doc_id = b.doc_id WHERE d.status <> 'removed') " +
        "SELECT provenance, count(*)::BIGINT AS n, sum(length(text))::BIGINT AS chars_sum, " +
        "sum(len(string_split_regex(lower(trim(text)), '\\s+')))::BIGINT AS tokens_sum, " +
        "sum(doc_id)::BIGINT AS id_sum FROM s GROUP BY provenance"),
    // identical rank recompute: Knuth hash order inside each stratum
    "sample_fixed_k" ->
      ("WITH h AS (SELECT doc_id, source, (doc_id * 2654435761) % 4294967296 AS h FROM documents), " +
        "r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn FROM h) " +
        "SELECT source, count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum " +
        "FROM r WHERE rn <= 7 GROUP BY source"),
    // replan the identical bucket layout: integer exclusive-cumsum in
    // hash order, integer division by the target size
    "compaction_plan" ->
      ("WITH h AS (SELECT source, doc_id, n_chars, (doc_id * 2654435761) % 4294967296 AS h FROM documents), " +
        "c AS (SELECT source, doc_id, n_chars, " +
        "sum(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) - n_chars AS excl FROM h), " +
        "b AS (SELECT source, doc_id, n_chars, excl // 3000 AS bucket FROM c), " +
        "g AS (SELECT source, bucket, count(*)::BIGINT AS n_rows, sum(n_chars)::BIGINT AS bucket_size FROM b GROUP BY source, bucket) " +
        "SELECT source, count(*)::BIGINT AS n_buckets, sum(n_rows)::BIGINT AS n_rows, " +
        "sum(bucket_size)::BIGINT AS chars_sum, max(bucket)::BIGINT AS max_bucket, " +
        "sum(bucket * n_rows)::BIGINT AS bucket_weight FROM g GROUP BY source"),
    // golden at the gate SF (deterministic: fixed MurmurHash3 seeds over
    // fixed data); recall/hamming flags are structural constants
    "dedup_simhash" ->
      "SELECT 20::BIGINT AS n_pairs, 1::BIGINT AS hamming_bound_ok, 1::BIGINT AS recall_ge_95",
    // full replay of the dHash chain from the pixel formula: integer luma
    // (grayscale: the sample), 2x2 block means (18x16 / 9x8 grid), neighbor
    // comparison bits, all-pairs hamming <= 3 — the engine must reproduce
    // the exact pair list through its real PNG encode/decode round-trip
    "image_phash_dedup" ->
      ("WITH ids AS (SELECT doc_id AS id, doc_id // 2 AS k FROM documents), " +
        "px AS (SELECT id, x, y, " +
        "(x*x*(1 + k % 5) + y*y*(2 + k % 7) + x*y*(k % 11)) % 256 AS v " +
        "FROM ids, (SELECT unnest(range(0, 18)) AS x), (SELECT unnest(range(0, 16)) AS y)), " +
        "cells AS (SELECT id, y // 2 AS gy, x // 2 AS gx, sum(v) // 4 AS cell " +
        "FROM px GROUP BY id, y // 2, x // 2), " +
        "bits AS (SELECT a.id, a.gy, a.gx, CASE WHEN b.cell > a.cell THEN 1 ELSE 0 END AS bit " +
        "FROM cells a JOIN cells b ON b.id = a.id AND b.gy = a.gy AND b.gx = a.gx + 1 " +
        "WHERE a.gx < 8), " +
        "sigs AS (SELECT id, list(bit ORDER BY gy * 8 + gx) AS bl FROM bits GROUP BY id), " +
        "pairs AS (SELECT s1.id AS id_a, s2.id AS id_b, " +
        "list_sum(list_transform(range(1, 65), i -> CASE WHEN s1.bl[i] <> s2.bl[i] THEN 1 ELSE 0 END))::BIGINT AS hamming " +
        "FROM sigs s1 JOIN sigs s2 ON s1.id < s2.id) " +
        "SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b"),
    // the store cycle is invisible to the result: image_phash_dedup's
    // full pixel->bits->pairs replay VERBATIM
    "image_phash_incremental" ->
      ("WITH ids AS (SELECT doc_id AS id, doc_id // 2 AS k FROM documents), " +
        "px AS (SELECT id, x, y, " +
        "(x*x*(1 + k % 5) + y*y*(2 + k % 7) + x*y*(k % 11)) % 256 AS v " +
        "FROM ids, (SELECT unnest(range(0, 18)) AS x), (SELECT unnest(range(0, 16)) AS y)), " +
        "cells AS (SELECT id, y // 2 AS gy, x // 2 AS gx, sum(v) // 4 AS cell " +
        "FROM px GROUP BY id, y // 2, x // 2), " +
        "bits AS (SELECT a.id, a.gy, a.gx, CASE WHEN b.cell > a.cell THEN 1 ELSE 0 END AS bit " +
        "FROM cells a JOIN cells b ON b.id = a.id AND b.gy = a.gy AND b.gx = a.gx + 1 " +
        "WHERE a.gx < 8), " +
        "sigs AS (SELECT id, list(bit ORDER BY gy * 8 + gx) AS bl FROM bits GROUP BY id), " +
        "pairs AS (SELECT s1.id AS id_a, s2.id AS id_b, " +
        "list_sum(list_transform(range(1, 65), i -> CASE WHEN s1.bl[i] <> s2.bl[i] THEN 1 ELSE 0 END))::BIGINT AS hamming " +
        "FROM sigs s1 JOIN sigs s2 ON s1.id < s2.id) " +
        "SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b"),
    // streaming the probe must not change one pair: the cross-parity
    // (day-0 x day-1) subset of the same replay
    "stream_sig_probe" ->
      ("WITH ids AS (SELECT doc_id AS id, doc_id // 2 AS k FROM documents), " +
        "px AS (SELECT id, x, y, " +
        "(x*x*(1 + k % 5) + y*y*(2 + k % 7) + x*y*(k % 11)) % 256 AS v " +
        "FROM ids, (SELECT unnest(range(0, 18)) AS x), (SELECT unnest(range(0, 16)) AS y)), " +
        "cells AS (SELECT id, y // 2 AS gy, x // 2 AS gx, sum(v) // 4 AS cell " +
        "FROM px GROUP BY id, y // 2, x // 2), " +
        "bits AS (SELECT a.id, a.gy, a.gx, CASE WHEN b.cell > a.cell THEN 1 ELSE 0 END AS bit " +
        "FROM cells a JOIN cells b ON b.id = a.id AND b.gy = a.gy AND b.gx = a.gx + 1 " +
        "WHERE a.gx < 8), " +
        "sigs AS (SELECT id, list(bit ORDER BY gy * 8 + gx) AS bl FROM bits GROUP BY id), " +
        "pairs AS (SELECT s1.id AS id_a, s2.id AS id_b, " +
        "list_sum(list_transform(range(1, 65), i -> CASE WHEN s1.bl[i] <> s2.bl[i] THEN 1 ELSE 0 END))::BIGINT AS hamming " +
        "FROM sigs s1 JOIN sigs s2 ON s1.id < s2.id) " +
        "SELECT id_a, id_b, hamming FROM pairs " +
        "WHERE hamming <= 3 AND (id_a % 2) <> (id_b % 2) ORDER BY id_a, id_b"),
    // JPEG codec contract: decode fidelity + perceptual invariance hold
    // for every row (the 385-class texture universe is exhaustively
    // bound-checked in JpegSpec, so the pins are SF-independent)
    "jpeg_phash_props" ->
      ("SELECT count(*) AS n, count(*) AS n_decoded, count(*) AS n_dims_ok, " +
        "count(*) AS n_close FROM documents"),
    // the production twin replayed from the same pixel formula: identical
    // signatures group identically, so the report is a pure function of
    // the planted textures
    "image_phash_report" ->
      ("WITH ids AS (SELECT doc_id AS id, doc_id // 2 AS k FROM documents), " +
        "px AS (SELECT id, x, y, " +
        "(x*x*(1 + k % 5) + y*y*(2 + k % 7) + x*y*(k % 11)) % 256 AS v " +
        "FROM ids, (SELECT unnest(range(0, 18)) AS x), (SELECT unnest(range(0, 16)) AS y)), " +
        "cells AS (SELECT id, y // 2 AS gy, x // 2 AS gx, sum(v) // 4 AS cell " +
        "FROM px GROUP BY id, y // 2, x // 2), " +
        "bits AS (SELECT a.id, a.gy, a.gx, CASE WHEN b.cell > a.cell THEN 1 ELSE 0 END AS bit " +
        "FROM cells a JOIN cells b ON b.id = a.id AND b.gy = a.gy AND b.gx = a.gx + 1 " +
        "WHERE a.gx < 8), " +
        "sigs AS (SELECT id, list(bit ORDER BY gy * 8 + gx) AS bl FROM bits GROUP BY id), " +
        "g AS (SELECT bl, count(*)::BIGINT AS sz, min(id) AS rep FROM sigs GROUP BY bl) " +
        "SELECT sum(sz)::BIGINT AS n_images, count(*)::BIGINT AS n_distinct_hashes, " +
        "count(CASE WHEN sz > 1 THEN 1 END)::BIGINT AS n_dup_groups, " +
        "sum(CASE WHEN sz > 1 THEN sz - 1 ELSE 0 END)::BIGINT AS n_redundant, " +
        "max(sz)::BIGINT AS max_group, sum(rep % 1000003)::BIGINT AS rep_checksum FROM g"),
    // full replay of the envelope-hash chain from the sample formula:
    // |sample| window energies (650 frames / 65 windows of 10), adjacent-
    // window comparison bits, all-pairs hamming <= 3 — through the
    // engine's real WAV encode/decode round-trip
    "audio_fingerprint_dedup" ->
      ("WITH ids AS (SELECT doc_id AS id, doc_id // 2 AS k FROM documents), " +
        "sm AS (SELECT id, t, abs((t*t*(1 + k % 7) + t*(k % 13)) % 2001 - 1000) AS av " +
        "FROM ids, (SELECT unnest(range(0, 650)) AS t)), " +
        "en AS (SELECT id, t // 10 AS w, sum(av)::BIGINT AS e FROM sm GROUP BY id, t // 10), " +
        "bits AS (SELECT a.id, a.w, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit " +
        "FROM en a JOIN en b ON b.id = a.id AND b.w = a.w + 1 WHERE a.w < 64), " +
        "sigs AS (SELECT id, list(bit ORDER BY w) AS bl FROM bits GROUP BY id), " +
        "pairs AS (SELECT s1.id AS id_a, s2.id AS id_b, " +
        "list_sum(list_transform(range(1, 65), i -> CASE WHEN s1.bl[i] <> s2.bl[i] THEN 1 ELSE 0 END))::BIGINT AS hamming " +
        "FROM sigs s1 JOIN sigs s2 ON s1.id < s2.id) " +
        "SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b"),
    // planted-cluster ground truth: 8 clusters x C(6,2) in-cluster pairs
    "embed_pairs_lsh" ->
      "SELECT 120::BIGINT AS n_pairs, 120::BIGINT AS n_in_cluster, 0::BIGINT AS n_cross_cluster",
    // exact-arithmetic recompute of the int8 quantization (same double
    // widen/divide/floor-half-up), so q_sum pins every quantized element
    "embed_quantize" ->
      ("WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings), " +
        "s AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v), " +
        "q AS (SELECT vec_id, e, scale, " +
        "CASE WHEN scale <= 0 THEN list_transform(e, x -> 0::BIGINT) " +
        "ELSE list_transform(e, x -> greatest(least(floor(x / scale + 0.5)::BIGINT, 127), -127)) END AS qs FROM s), " +
        "m AS (SELECT vec_id, scale, qs, list_sum(qs)::BIGINT AS qsum, " +
        "list_max(list_transform(range(1, len(e) + 1), i -> abs(qs[i] * scale - e[i]))) AS maxerr, " +
        "len(list_filter(qs, x -> abs(x) = 127)) AS nsat FROM q) " +
        "SELECT count(*)::BIGINT AS n, sum(qsum)::BIGINT AS q_sum, " +
        "count(CASE WHEN maxerr <= scale / 2.0 THEN 1 END)::BIGINT AS n_err_in_bound, " +
        "sum(nsat)::BIGINT AS n_saturated FROM m"),
    // planted top-10: all ten near-copies of the query must surface
    "ann_lsh_topk" ->
      "SELECT 10::BIGINT AS n, 10::BIGINT AS n_planted_found, 10::BIGINT AS n_high_cosine",
    "embed_pairs_exact" ->
      ("SELECT count(*) AS n_pairs, coalesce(sum(id_a + id_b), 0)::BIGINT AS pair_id_sum FROM (" +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, list_cosine_similarity(a.embedding, b.embedding) AS c " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) WHERE c >= 0.48"),
    "ann_topk" ->
      ("WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) " +
        "SELECT vec_id, row_number() OVER (ORDER BY list_cosine_similarity(embedding, qe) DESC, vec_id) AS rank " +
        "FROM embeddings, q WHERE vec_id <> 0 " +
        "ORDER BY list_cosine_similarity(embedding, qe) DESC, vec_id LIMIT 10"),
    "ann_ivf_topk" ->
      ("WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) " +
        "SELECT vec_id, row_number() OVER (ORDER BY list_cosine_similarity(embedding, qe) DESC, vec_id) AS rank " +
        "FROM embeddings, q WHERE vec_id <> 0 " +
        "ORDER BY list_cosine_similarity(embedding, qe) DESC, vec_id LIMIT 10"),
    // same 1e6-grid quantize, same middle-hash-bit sign matrix, exact sums
    "embed_project" ->
      ("WITH qz AS (SELECT vec_id, unnest(range(0, len(embedding))) AS i, " +
        "unnest(list_transform(embedding, e -> round(e::DOUBLE * 1000000)::BIGINT)) AS q FROM embeddings), " +
        "js AS (SELECT unnest(range(0, 8)) AS j), " +
        "s AS (SELECT qz.vec_id, js.j, sum(qz.q * (CASE WHEN ((qz.i * 2654435761 + js.j * 40503) // 65536) % 2 = 0 THEN 1 ELSE -1 END))::BIGINT AS y " +
        "FROM qz CROSS JOIN js GROUP BY qz.vec_id, js.j) " +
        "SELECT vec_id::BIGINT AS vec_id, (j + 1)::BIGINT AS pos, y FROM s ORDER BY vec_id, pos"),
    // ppm-grid cosine threshold against the 10-vector benchmark
    "decontaminate_semantic" ->
      ("WITH b AS (SELECT vec_id AS bench_id, list_transform(embedding, x -> x::DOUBLE) AS be " +
        "FROM embeddings WHERE vec_id < 10), " +
        "c AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ce " +
        "FROM embeddings WHERE vec_id >= 10), " +
        "s AS (SELECT c.vec_id, round(list_cosine_similarity(ce, be) * 1000000)::BIGINT AS cos_ppm " +
        "FROM c CROSS JOIN b) " +
        "SELECT vec_id::BIGINT AS vid, count(*)::BIGINT AS n_hits, max(cos_ppm)::BIGINT AS max_cos_ppm " +
        "FROM s WHERE cos_ppm >= 250000 GROUP BY vec_id ORDER BY vid"),
    "text_profile" ->
      ("WITH t AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS toks, " +
        "length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np, " +
        "length(regexp_replace(text, '[0-9]', '', 'g')) AS nd FROM documents), " +
        "s AS (SELECT doc_id, text, toks, " +
        "floor((length(text) - np)::DOUBLE / greatest(length(text), 1) * 10000)::BIGINT AS punct_ratio_x1e4, " +
        "floor((length(text) - nd)::DOUBLE / greatest(length(text), 1) * 10000)::BIGINT AS digit_ratio_x1e4, " +
        "floor(length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE / greatest(length(text), 1) * 10000)::BIGINT AS upper_ratio_x1e4, " +
        "len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','that','with'))) AS s_en, " +
        "len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS s_de, " +
        "len(list_filter(toks, x -> x IN ('le','la','les','et','est','dans','une','pour'))) AS s_fr, " +
        "len(list_filter(toks, x -> x IN ('el','los','las','es','en','una','por','para'))) AS s_es, " +
        "length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS s_zh FROM t) " +
        "SELECT doc_id, length(text)::BIGINT AS n_chars, len(toks)::BIGINT AS n_tokens, " +
        "list_sum(list_transform(toks, x -> ceil(length(x) / 4.0)))::BIGINT AS n_subwords, " +
        "punct_ratio_x1e4, digit_ratio_x1e4, upper_ratio_x1e4, " +
        "floor(least(length(text), 500) / 5.0 * 0.4 " +
        "  + (CASE WHEN length(text)::DOUBLE / greatest(len(toks), 1) BETWEEN 3 AND 12 THEN 100.0 ELSE 30.0 END) * 0.4 " +
        "  - (punct_ratio_x1e4 / 100.0) * 0.1 - (digit_ratio_x1e4 / 100.0) * 0.1)::BIGINT AS quality, " +
        "CASE WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en' " +
        "WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de' " +
        "WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr' " +
        "WHEN s_es >= s_zh THEN 'es' ELSE 'zh' END AS lang_pred " +
        "FROM s ORDER BY doc_id"),
    "text_fingerprint" ->
      ("SELECT count(*) AS n, count(DISTINCT regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS n_distinct_fp " +
        "FROM documents"),
    // same integer day-bucketing, max-per-bucket, forward fill, cent grid
    "gapfill_resample" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS b, value FROM events), " +
        "agg AS (SELECT user_id, b, max(value) AS v FROM e GROUP BY 1, 2), " +
        "rng AS (SELECT user_id, min(b) AS lo, max(b) AS hi FROM agg GROUP BY 1), " +
        "spine AS (SELECT user_id, unnest(range(lo, hi + 1)) AS b FROM rng), " +
        "j AS (SELECT s.user_id, s.b, a.v FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.b = a.b), " +
        "f AS (SELECT user_id, b, v, last_value(v IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv FROM j) " +
        "SELECT count(DISTINCT user_id) AS n_keys, count(*) AS n_buckets, " +
        "count(CASE WHEN v IS NULL THEN 1 END) AS n_gaps, " +
        "sum(round(fv * 100, 0))::BIGINT AS filled_checksum, " +
        "sum(round(v * 100, 0))::BIGINT AS observed_checksum FROM f"),
    // identical BM25 arithmetic, term-filtered postings, floor(x*1e4) grid
    "bm25_topk" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), " +
        "dl AS (SELECT doc_id, len(t)::BIGINT AS dl FROM toks), " +
        "st AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM dl), " +
        "p AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM " +
        "(SELECT doc_id, unnest(t) AS tok FROM toks) " +
        "WHERE tok IN ('hash', 'join', 'window', 'stream') GROUP BY doc_id, tok), " +
        "f AS (SELECT tok, count(*)::DOUBLE AS df FROM p GROUP BY tok), " +
        "sc AS (SELECT p.doc_id, d.dl, floor(sum(" +
        "ln(1.0 + (st.n - f.df + 0.5) / (f.df + 0.5)) * p.tf::DOUBLE * (1.2 + 1.0) / " +
        "(p.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * d.dl::DOUBLE / st.avgdl))" +
        ") * 10000 + 0.000001)::BIGINT AS score_x1e4 " +
        "FROM p JOIN f USING (tok) JOIN dl d USING (doc_id) CROSS JOIN st GROUP BY p.doc_id, d.dl) " +
        "SELECT doc_id, dl, score_x1e4 FROM sc ORDER BY score_x1e4 DESC, doc_id LIMIT 10"),
    // the store is invisible to the result by construction: identical
    // BM25 replay as bm25_topk (same query, same grid)
    "bm25_store_probe" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents WHERE text IS NOT NULL), " +
        "dl AS (SELECT doc_id, len(t)::BIGINT AS dl FROM toks), " +
        "st AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM dl), " +
        "p AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM " +
        "(SELECT doc_id, unnest(t) AS tok FROM toks) " +
        "WHERE tok IN ('hash', 'join', 'window', 'stream') GROUP BY doc_id, tok), " +
        "f AS (SELECT tok, count(*)::DOUBLE AS df FROM p GROUP BY tok), " +
        "sc AS (SELECT p.doc_id, d.dl, floor(sum(" +
        "ln(1.0 + (st.n - f.df + 0.5) / (f.df + 0.5)) * p.tf::DOUBLE * (1.2 + 1.0) / " +
        "(p.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * d.dl::DOUBLE / st.avgdl))" +
        ") * 10000 + 0.000001)::BIGINT AS score_x1e4 " +
        "FROM p JOIN f USING (tok) JOIN dl d USING (doc_id) CROSS JOIN st GROUP BY p.doc_id, d.dl) " +
        "SELECT doc_id, dl, score_x1e4 FROM sc ORDER BY score_x1e4 DESC, doc_id LIMIT 10"),
    // merge == rebuild: postings are per-document pure, stats add exactly,
    // so the oracle replays everything from the corpus alone — the audit
    // counts are zero-by-construction and the top-k is the direct BM25
    "bm25_incremental" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents WHERE text IS NOT NULL), " +
        "dl AS (SELECT doc_id, len(t)::BIGINT AS dl FROM toks), " +
        "allp AS (SELECT doc_id, unnest(t) AS tok FROM toks), " +
        "pr AS (SELECT count(*)::BIGINT AS postings_rows FROM (SELECT tok, doc_id FROM allp GROUP BY tok, doc_id)), " +
        "cs AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl), " +
        "st AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM dl), " +
        "p AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM allp " +
        "WHERE tok IN ('hash', 'join', 'window', 'stream') GROUP BY doc_id, tok), " +
        "f AS (SELECT tok, count(*)::DOUBLE AS df FROM p GROUP BY tok), " +
        "sc AS (SELECT p.doc_id, d.dl, floor(sum(" +
        "ln(1.0 + (st.n - f.df + 0.5) / (f.df + 0.5)) * p.tf::DOUBLE * (1.2 + 1.0) / " +
        "(p.tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * d.dl::DOUBLE / st.avgdl))" +
        ") * 10000 + 0.000001)::BIGINT AS score_x1e4 " +
        "FROM p JOIN f USING (tok) JOIN dl d USING (doc_id) CROSS JOIN st GROUP BY p.doc_id, d.dl), " +
        "tk AS (SELECT doc_id, score_x1e4 FROM sc ORDER BY score_x1e4 DESC, doc_id LIMIT 10), " +
        "t1 AS (SELECT doc_id AS top1_doc, score_x1e4 AS top1_score FROM tk ORDER BY score_x1e4 DESC, doc_id LIMIT 1) " +
        "SELECT pr.postings_rows, 0::BIGINT AS postings_mismatch, cs.n_docs, cs.sum_dl, " +
        "(SELECT count(*) FROM tk)::BIGINT AS topk_rows, 0::BIGINT AS topk_mismatch, " +
        "t1.top1_doc, t1.top1_score FROM pr, cs, t1"),
    // full NB replay: identical md5-slice buckets, Laplace-smoothed ln
    // likelihoods, x1e4-floored scores, argmax with label tie-break
    "nb_classify" -> nbClassifyOracleSql,
    // in-row production twin: same predictions by the spec'd law
    "nb_classify_inrow" -> nbClassifyOracleSql,
    // the stream and the in-row literal-model scorer must not change one
    // prediction: nb_classify's oracle verbatim
    "stream_nb_classify" -> nbClassifyOracleSql,
    // full replay of the clip-fingerprint chain from the frame-byte
    // formula: per-frame byte mass, 65 windows of 2 frames, adjacent-
    // window comparison bits, all-pairs hamming <= 3 — through the
    // engine's real AVI encode/decode round-trip
    "video_fingerprint_dedup" ->
      ("WITH ids AS (SELECT doc_id AS id, doc_id // 2 AS k FROM documents), " +
        "fb AS (SELECT id, f, (j*(1 + k % 5) + f*f*(2 + k % 7) + f*(k % 11)) % 256 AS v " +
        "FROM ids, (SELECT unnest(range(0, 130)) AS f), (SELECT unnest(range(0, 32)) AS j)), " +
        "en AS (SELECT id, f // 2 AS w, sum(v)::BIGINT AS e FROM fb GROUP BY id, f // 2), " +
        "bits AS (SELECT a.id, a.w, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit " +
        "FROM en a JOIN en b ON b.id = a.id AND b.w = a.w + 1 WHERE a.w < 64), " +
        "sigs AS (SELECT id, list(bit ORDER BY w) AS bl FROM bits GROUP BY id), " +
        "pairs AS (SELECT s1.id AS id_a, s2.id AS id_b, " +
        "list_sum(list_transform(range(1, 65), i -> CASE WHEN s1.bl[i] <> s2.bl[i] THEN 1 ELSE 0 END))::BIGINT AS hamming " +
        "FROM sigs s1 JOIN sigs s2 ON s1.id < s2.id) " +
        "SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b"),
    // same planted PII, same RE2-compatible patterns, same sequential
    // count-then-replace order as Redaction.redactionCount
    "redact_pii" ->
      ("WITH base AS (SELECT doc_id, text " +
        "|| CASE WHEN doc_id % 7 = 0 THEN ' reach user' || doc_id || '@mail.example.com' ELSE '' END " +
        "|| CASE WHEN doc_id % 11 = 0 THEN ' ssn 987-65-4321' ELSE '' END " +
        "|| CASE WHEN doc_id % 13 = 0 THEN ' call (415) 555-0142' ELSE '' END " +
        "|| CASE WHEN doc_id % 17 = 0 THEN ' card 4111-1111-1111-1111' ELSE '' END " +
        "|| CASE WHEN doc_id % 19 = 0 THEN ' host 10.0.12.34' ELSE '' END AS t FROM documents), " +
        "r1 AS (SELECT doc_id, t, len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS c1, " +
        "regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1 FROM base), " +
        "r2 AS (SELECT *, len(regexp_extract_all(t1, '\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}')) AS c2, " +
        "regexp_replace(t1, '\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}', '[CCN]', 'g') AS t2 FROM r1), " +
        "r3 AS (SELECT *, len(regexp_extract_all(t2, '\\d{3}-\\d{2}-\\d{4}')) AS c3, " +
        "regexp_replace(t2, '\\d{3}-\\d{2}-\\d{4}', '[SSN]', 'g') AS t3 FROM r2), " +
        "r4 AS (SELECT *, len(regexp_extract_all(t3, '\\(\\d{3}\\) \\d{3}-\\d{4}')) AS c4, " +
        "regexp_replace(t3, '\\(\\d{3}\\) \\d{3}-\\d{4}', '[PHONE]', 'g') AS t4 FROM r3), " +
        "r5 AS (SELECT *, len(regexp_extract_all(t4, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS c5, " +
        "regexp_replace(t4, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g') AS t5 FROM r4) " +
        "SELECT count(*) AS n_docs, " +
        "sum(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')))::BIGINT AS n_email, " +
        "sum(len(regexp_extract_all(t, '\\d{3}-\\d{2}-\\d{4}')))::BIGINT AS n_ssn, " +
        "sum(len(regexp_extract_all(t, '\\(\\d{3}\\) \\d{3}-\\d{4}')))::BIGINT AS n_phone, " +
        "sum(c1 + c2 + c3 + c4 + c5)::BIGINT AS n_redactions, " +
        "0::BIGINT AS n_residue, " +
        "sum(len(t) - len(t5))::BIGINT AS len_delta FROM r5"),
    // full default chain replayed, then the two opt-in fragment rules; the
    // planted email chains leave one domain fragment per %7 doc under the
    // default rules and ZERO under the extended pass
    "redact_pii_extended" ->
      ("WITH base AS (SELECT doc_id, text " +
        "|| CASE WHEN doc_id % 7 = 0 THEN ' reach user' || doc_id || '@mail.example.com@leak.example.org' ELSE '' END AS t FROM documents), " +
        "r1 AS (SELECT doc_id, regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1 FROM base), " +
        "r2 AS (SELECT doc_id, regexp_replace(t1, '\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}', '[CCN]', 'g') AS t2 FROM r1), " +
        "r3 AS (SELECT doc_id, regexp_replace(t2, '\\d{3}-\\d{2}-\\d{4}', '[SSN]', 'g') AS t3 FROM r2), " +
        "r4 AS (SELECT doc_id, regexp_replace(t3, '\\(\\d{3}\\) \\d{3}-\\d{4}', '[PHONE]', 'g') AS t4 FROM r3), " +
        "r5 AS (SELECT doc_id, regexp_replace(t4, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g') AS t5 FROM r4), " +
        "r6 AS (SELECT doc_id, t5, regexp_replace(t5, '\\[EMAIL\\](@[A-Za-z0-9.-]+)+', '[EMAIL]', 'g') AS t6 FROM r5), " +
        "r7 AS (SELECT doc_id, t5, regexp_replace(t6, '([A-Za-z0-9._%+-]+@)+\\[EMAIL\\]', '[EMAIL]', 'g') AS t7 FROM r6) " +
        "SELECT count(*) AS n_docs, " +
        "sum(len(regexp_extract_all(t5, '\\[EMAIL\\]@[A-Za-z0-9.-]+')))::BIGINT AS n_frag_default, " +
        "sum(len(regexp_extract_all(t7, '\\[EMAIL\\]@[A-Za-z0-9.-]+')))::BIGINT AS n_frag_extended, " +
        "sum(len(t5) - len(t7))::BIGINT AS len_delta FROM r7"),
    // the full Gopher set (Rae et al. 2021 Table A1) replayed: same token
    // grid, top-gram char mass with the same ties-to-larger-mass rule,
    // dup-gram coverage via DISTINCT token positions (overlaps once),
    // integer // division throughout
    "text_repetition" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks, " +
        "string_split(text, chr(10)) AS lines FROM documents), " +
        "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS b " +
        "FROM t WHERE len(toks) >= 2), " +
        "bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b), " +
        "bs AS (SELECT doc_id, max(c) AS top_n, sum(c) AS n_bg FROM bc GROUP BY doc_id), " +
        "tc AS (SELECT doc_id, coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS tot FROM t), " +
        "nn AS (SELECT unnest([2, 3, 4, 5, 6, 7, 8, 9, 10]) AS nv), " +
        "gp0 AS (SELECT doc_id, nv, toks, unnest(range(1, len(toks) - nv + 2)) AS i " +
        "FROM t, nn WHERE len(toks) >= nv), " +
        "gp AS (SELECT doc_id, nv, i, array_to_string(toks[i:i+nv-1], ' ') AS g FROM gp0), " +
        "gc AS (SELECT doc_id, nv, g, count(*) AS c FROM gp GROUP BY 1, 2, 3), " +
        "mx AS (SELECT doc_id, nv, max(c) AS mc FROM gc WHERE nv <= 4 GROUP BY 1, 2), " +
        "tm AS (SELECT gc.doc_id, gc.nv, max((length(g) - (gc.nv - 1)) * c) AS mass " +
        "FROM gc JOIN mx ON gc.doc_id = mx.doc_id AND gc.nv = mx.nv AND gc.c = mx.mc GROUP BY 1, 2), " +
        "tmp AS (SELECT doc_id, " +
        "max(CASE WHEN nv = 2 THEN mass END) AS m2, max(CASE WHEN nv = 3 THEN mass END) AS m3, " +
        "max(CASE WHEN nv = 4 THEN mass END) AS m4 FROM tm GROUP BY doc_id), " +
        "dupg AS (SELECT doc_id, nv, g FROM gc WHERE nv >= 5 AND c > 1), " +
        "cov0 AS (SELECT gp.doc_id, gp.nv, unnest(range(gp.i, gp.i + gp.nv)) AS pos " +
        "FROM gp JOIN dupg ON gp.doc_id = dupg.doc_id AND gp.nv = dupg.nv AND gp.g = dupg.g), " +
        "cov AS (SELECT DISTINCT doc_id, nv, pos FROM cov0), " +
        "tp AS (SELECT doc_id, pos, length(toks[pos]) AS tlen FROM " +
        "(SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM t)), " +
        "dm AS (SELECT cov.doc_id, cov.nv, sum(tp.tlen) AS mass FROM cov " +
        "JOIN tp ON cov.doc_id = tp.doc_id AND cov.pos = tp.pos GROUP BY 1, 2), " +
        "dmp AS (SELECT doc_id, " +
        "max(CASE WHEN nv = 5 THEN mass END) AS d5, max(CASE WHEN nv = 6 THEN mass END) AS d6, " +
        "max(CASE WHEN nv = 7 THEN mass END) AS d7, max(CASE WHEN nv = 8 THEN mass END) AS d8, " +
        "max(CASE WHEN nv = 9 THEN mass END) AS d9, max(CASE WHEN nv = 10 THEN mass END) AS d10 " +
        "FROM dm GROUP BY doc_id) " +
        "SELECT t.doc_id, len(lines)::BIGINT AS n_lines, " +
        "floor((len(lines) - len(list_distinct(lines)))::DOUBLE / greatest(len(lines), 1) * 10000)::BIGINT AS dup_line_frac_x1e4, " +
        "coalesce(n_bg, 0)::BIGINT AS n_bigrams, coalesce(top_n, 0)::BIGINT AS top_bigram_n, " +
        "floor(coalesce(top_n, 0)::DOUBLE / greatest(coalesce(n_bg, 0), 1) * 10000)::BIGINT AS top_bigram_frac_x1e4, " +
        "(coalesce(m2, 0) * 10000 // greatest(tot, 1))::BIGINT AS top2_char_frac_x1e4, " +
        "(coalesce(m3, 0) * 10000 // greatest(tot, 1))::BIGINT AS top3_char_frac_x1e4, " +
        "(coalesce(m4, 0) * 10000 // greatest(tot, 1))::BIGINT AS top4_char_frac_x1e4, " +
        "(coalesce(d5, 0) * 10000 // greatest(tot, 1))::BIGINT AS dup5_char_frac_x1e4, " +
        "(coalesce(d6, 0) * 10000 // greatest(tot, 1))::BIGINT AS dup6_char_frac_x1e4, " +
        "(coalesce(d7, 0) * 10000 // greatest(tot, 1))::BIGINT AS dup7_char_frac_x1e4, " +
        "(coalesce(d8, 0) * 10000 // greatest(tot, 1))::BIGINT AS dup8_char_frac_x1e4, " +
        "(coalesce(d9, 0) * 10000 // greatest(tot, 1))::BIGINT AS dup9_char_frac_x1e4, " +
        "(coalesce(d10, 0) * 10000 // greatest(tot, 1))::BIGINT AS dup10_char_frac_x1e4 " +
        "FROM t LEFT JOIN bs ON t.doc_id = bs.doc_id LEFT JOIN tc ON t.doc_id = tc.doc_id " +
        "LEFT JOIN tmp ON t.doc_id = tmp.doc_id LEFT JOIN dmp ON t.doc_id = dmp.doc_id " +
        "ORDER BY t.doc_id"),
    "text_compress_ratio" -> textCompressRatioOracleSql,
    // full-row recompute incl. the truncated string itself
    "truncate_tokens" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents WHERE text IS NOT NULL) " +
        "SELECT doc_id, len(toks)::BIGINT AS n_tokens, " +
        "least(len(toks), 40)::BIGINT AS n_kept, " +
        "array_to_string(toks[1:40], ' ') AS text_trunc FROM t ORDER BY doc_id"),
    // full per-doc decision recompute: same integer cross-multiplied rules
    // (no division, no floats), so the keep/reasons bits match bit-for-bit
    "quality_filter" ->
      ("WITH t AS (SELECT doc_id, text IS NULL AS is_null, string_split_regex(lower(trim(text)), '\\s+') AS toks, " +
        "string_split(text, chr(10)) AS lines FROM documents), " +
        "s AS (SELECT doc_id, is_null, len(toks)::BIGINT AS n, " +
        "list_sum(list_transform(toks, x -> length(x)))::BIGINT AS chars, " +
        "len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is')))::BIGINT AS stop, " +
        "len(lines)::BIGINT AS n_lines, " +
        "(len(lines) - len(list_distinct(lines)))::BIGINT AS dup_lines FROM t), " +
        "r AS (SELECT doc_id, CASE WHEN is_null THEN 0 ELSE n END AS n, " +
        "CASE WHEN is_null THEN 1 ELSE " +
        "(CASE WHEN n < 30 THEN 1 ELSE 0 END " +
        " + CASE WHEN chars*10 < n*30 OR chars*10 > n*100 THEN 2 ELSE 0 END " +
        " + CASE WHEN stop*1000 < n*20 THEN 4 ELSE 0 END " +
        " + CASE WHEN dup_lines*1000 > n_lines*300 THEN 8 ELSE 0 END) END::BIGINT AS reasons FROM s) " +
        "SELECT doc_id, n AS n_tokens, reasons, " +
        "(CASE WHEN reasons = 0 THEN 1 ELSE 0 END)::BIGINT AS keep FROM r ORDER BY doc_id"),
    "vocab_topk" ->
      ("WITH t AS (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM documents), " +
        "c AS (SELECT tok, count(*)::BIGINT AS n FROM t WHERE tok <> '' GROUP BY tok) " +
        "SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 20"),
    "vocab_cms" ->
      "SELECT 20::BIGINT AS n_probes, 20::BIGINT AS n_ge_true, 20::BIGINT AS n_within_eps",
    // bit-exact recompute of the 20-bit Morton interleave
    "zorder_cluster" ->
      ("WITH b AS (SELECT l_orderkey, l_partkey % 1024 AS x, l_suppkey % 1024 AS y FROM lineitem), " +
        "z AS (SELECT l_orderkey, list_sum(list_transform(range(0, 10), " +
        "i -> (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i+1)))) AS zv FROM b) " +
        "SELECT count(*)::BIGINT AS n, sum(zv)::BIGINT AS z_sum, min(zv)::BIGINT AS z_min, " +
        "max(zv)::BIGINT AS z_max, sum(l_orderkey)::BIGINT AS id_sum FROM z"),
    "stage_roundtrip" ->
      ("SELECT count(*) AS n, count(c_name) AS n_len16, count(*) AS records_detail, " +
        "5::BIGINT AS out_cols FROM customer"),
    // the masked name stays 16 chars and non-null for every input row, and
    // the production-gated stage must be skipped under the test environment
    "stage_pipeline" ->
      ("SELECT count(*) AS n, count(c_name) AS n_len16, sum(c_custkey)::BIGINT AS custkey_sum, " +
        "1::BIGINT AS prod_stage_skipped FROM customer"),
    "stage_config_errors" ->
      ("SELECT 3::BIGINT AS n_errors_bad, 1::BIGINT AS n_unknown_bad, " +
        "0::BIGINT AS good_failed, 1::BIGINT AS good_persist, " +
        "0::BIGINT AS hocon_good_failed, 2::BIGINT AS hocon_n_errors_bad"),
    "fixture_e2e" ->
      ("SELECT 100::BIGINT AS n, 95::BIGINT AS n_user_nonnull, 95::BIGINT AS n_user_len16, " +
        "96::BIGINT AS n_birth_nonnull, 96::BIGINT AS n_birth_day1, " +
        "100::BIGINT AS n_create_nonnull, 100::BIGINT AS n_create_min0, " +
        "100::BIGINT AS n_create_inbounds"),
    "multimodal_features" ->
      ("SELECT count(*) AS n, count(*) AS n_png, " +
        "sum(1 + doc_id % 64)::BIGINT AS width_sum, sum(1 + doc_id % 48)::BIGINT AS height_sum, " +
        "count(*) AS n_feat8, count(*) AS n_mean_exact, count(*) AS n_std_zero FROM documents"),
    "events_dedup_stream" ->
      ("SELECT count(*)::BIGINT AS n_out, count(*)::BIGINT AS n_distinct, " +
        "sum(event_id)::BIGINT AS id_sum FROM events"),
    // same integer counts -> H = ln(n) - (sum c ln c)/n on the 1e-4 grid
    "token_entropy" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents), " +
        "pc AS (SELECT doc_id, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2), " +
        "pd AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens, " +
        "floor((ln(sum(c)::DOUBLE) - sum(c::DOUBLE * ln(c::DOUBLE)) / sum(c)) * 10000 + 1e-6)::BIGINT AS entropy_x1e4 " +
        "FROM pc GROUP BY 1) " +
        "SELECT d.doc_id, coalesce(n_tokens, 0)::BIGINT AS n_tokens, " +
        "coalesce(entropy_x1e4, 0)::BIGINT AS entropy_x1e4 " +
        "FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id"),
    // identical pair stream (1-based lists, same window), divisions-first
    // PMI on the 1e-4 floor grid with the bm25-style 1e-6 nudge
    "pmi_pairs" ->
      ("WITH t AS (SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'), w -> len(w) > 0) AS toks " +
        "FROM documents WHERE text IS NOT NULL), " +
        "tok AS (SELECT unnest(toks) AS w FROM t), " +
        "uni AS (SELECT w, count(*) AS c FROM tok GROUP BY 1), " +
        "n AS (SELECT sum(c)::BIGINT AS n_tok FROM uni), " +
        "pos AS (SELECT toks, unnest(range(1, len(toks) + 1)) AS i FROM t WHERE len(toks) >= 2), " +
        "pr AS (SELECT least(toks[i], toks[j]) AS x, greatest(toks[i], toks[j]) AS y " +
        "FROM (SELECT toks, i, unnest(range(i + 1, least(i + 3, len(toks)) + 1)) AS j FROM pos) q), " +
        "pcall AS (SELECT x, y, count(*) AS n_xy FROM pr GROUP BY 1, 2), " +
        "p AS (SELECT sum(n_xy)::BIGINT AS n_pairs FROM pcall), " +
        "s AS (SELECT x, y, n_xy, " +
        "floor(ln((n_xy::DOUBLE / n_pairs) * (n_tok::DOUBLE / cx.c) * (n_tok::DOUBLE / cy.c)) * 10000 + 1e-6)::BIGINT AS pmi_x1e4 " +
        "FROM pcall CROSS JOIN p CROSS JOIN n JOIN uni cx ON pcall.x = cx.w JOIN uni cy ON pcall.y = cy.w " +
        "WHERE n_xy >= 5) " +
        "SELECT x, y, n_xy, pmi_x1e4 FROM s ORDER BY pmi_x1e4 DESC, x, y LIMIT 20"),
    // FIM: same ring-hash draws + substr algebra, replayed per document
    "fim_transform" ->
      ("WITH c AS (SELECT doc_id, text, " +
        "(doc_id * 2654435761) % 4294967296 % (length(text) + 1) AS c1 FROM documents), " +
        "d AS (SELECT doc_id, text, c1, " +
        "c1 + ((doc_id + 7919) * 2654435761) % 4294967296 % (length(text) - c1 + 1) AS c2 FROM c) " +
        "SELECT doc_id, c1::BIGINT AS c1, c2::BIGINT AS c2, " +
        "'<PRE>' || substr(text, 1, c1::INT) || '<SUF>' || substr(text, (c2 + 1)::INT) || " +
        "'<MID>' || substr(text, (c1 + 1)::INT, (c2 - c1)::INT) AS fim_text FROM d"),
    // per-group clamp at exact percentiles; cent-grid floor kills float noise
    "winsorize_stats" ->
      ("WITH c AS (SELECT l_returnflag AS g, quantile_cont(l_extendedprice, 0.05) AS lo, " +
        "quantile_cont(l_extendedprice, 0.95) AS hi FROM lineitem GROUP BY 1), " +
        "w AS (SELECT l_returnflag, l_extendedprice, " +
        "least(greatest(l_extendedprice, lo), hi) AS vw FROM lineitem JOIN c ON l_returnflag = c.g) " +
        "SELECT l_returnflag AS rf, count(*) AS n, " +
        "sum(floor(vw * 100)::BIGINT)::BIGINT AS w_cents_sum, " +
        "min(floor(vw * 100)::BIGINT) AS w_cents_min, " +
        "max(floor(vw * 100)::BIGINT) AS w_cents_max, " +
        "count(CASE WHEN vw <> l_extendedprice THEN 1 END) AS n_clamped " +
        "FROM w GROUP BY 1 ORDER BY 1"),
    // same cutpoints + lower-bucket tie rule the operator compiles to
    "length_buckets" ->
      ("WITH c AS (SELECT quantile_cont(n_chars, 0.125) AS q1, quantile_cont(n_chars, 0.25) AS q2, " +
        "quantile_cont(n_chars, 0.375) AS q3, quantile_cont(n_chars, 0.5) AS q4, " +
        "quantile_cont(n_chars, 0.625) AS q5, quantile_cont(n_chars, 0.75) AS q6, " +
        "quantile_cont(n_chars, 0.875) AS q7 FROM documents), " +
        "b AS (SELECT CASE WHEN n_chars <= q1 THEN 0 WHEN n_chars <= q2 THEN 1 " +
        "WHEN n_chars <= q3 THEN 2 WHEN n_chars <= q4 THEN 3 WHEN n_chars <= q5 THEN 4 " +
        "WHEN n_chars <= q6 THEN 5 WHEN n_chars <= q7 THEN 6 ELSE 7 END AS bucket, n_chars " +
        "FROM documents, c) " +
        "SELECT bucket::BIGINT AS bucket, count(*) AS n, min(n_chars)::BIGINT AS len_min, " +
        "max(n_chars)::BIGINT AS len_max FROM b GROUP BY 1 ORDER BY 1"),
    // A-ES weighted sample: u from the Knuth ring hash (exact in doubles),
    // key floor-snapped to 2^20 so a sub-ULP pow() difference can't reorder
    "weighted_sample" ->
      ("WITH k AS (SELECT lang, doc_id, floor(pow((doc_id * 2654435761 % 4294967296 + 0.5) / 4294967296, " +
        "1.0 / n_chars) * 1048576) AS key FROM documents WHERE n_chars > 0), " +
        "r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) AS rank FROM k) " +
        "SELECT lang, doc_id AS id, rank FROM r WHERE rank <= 5"),
    // solid-color PNG roundtrip: every field recomputable from doc_id
    "binary_ingest" ->
      ("SELECT count(*) AS n_assets, sum(doc_id)::BIGINT AS id_sum, " +
        "sum(1 + doc_id % 16)::BIGINT AS width_sum, sum(1 + doc_id % 12)::BIGINT AS height_sum, " +
        "count(*) AS n_pixel_exact FROM documents WHERE doc_id % 50 = 0"),
    "curate_pipeline" ->
      ("WITH q AS (SELECT doc_id, text, " +
        "len(string_split_regex(lower(trim(text)), '\\s+')) AS ntok, " +
        "length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np, " +
        "length(regexp_replace(text, '[0-9]', '', 'g')) AS nd FROM documents), " +
        "s AS (SELECT doc_id, ntok AS toks, " +
        "floor(least(length(text), 500) / 5.0 * 0.4 " +
        "  + (CASE WHEN length(text)::DOUBLE / greatest(ntok, 1) BETWEEN 3 AND 12 THEN 100.0 ELSE 30.0 END) * 0.4 " +
        "  - (floor((length(text) - np)::DOUBLE / greatest(length(text), 1) * 10000) / 100.0) * 0.1 " +
        "  - (floor((length(text) - nd)::DOUBLE / greatest(length(text), 1) * 10000) / 100.0) * 0.1)::BIGINT AS quality, " +
        "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS canon FROM q), " +
        "f AS (SELECT * FROM s WHERE quality >= 40), " +
        "d AS (SELECT f.* FROM f JOIN (SELECT canon, min(doc_id) AS m FROM f GROUP BY canon) r ON f.doc_id = r.m), " +
        "h AS (SELECT * FROM d WHERE (doc_id::HUGEINT * 2654435761) % 4294967296 < 2147483648) " +
        "SELECT count(*)::BIGINT AS n_curated, sum(doc_id)::BIGINT AS id_sum, sum(toks)::BIGINT AS token_sum FROM h"),
    "rollup_agg" ->
      ("SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls, " +
        "count(*)::BIGINT AS n, sum(l_quantity)::BIGINT AS qty_sum " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls"),
    "grouping_sets_agg" ->
      ("SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls, " +
        "GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid, " +
        "count(*)::BIGINT AS n, sum(l_quantity)::BIGINT AS qty_sum " +
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus)) " +
        "ORDER BY gid, rf, ls"),
    "topk_per_group" ->
      ("WITH q AS (SELECT doc_id, source, " +
        "len(string_split_regex(lower(trim(text)), '\\s+')) AS ntok, " +
        "length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np, " +
        "length(regexp_replace(text, '[0-9]', '', 'g')) AS nd, length(text) AS lc FROM documents), " +
        "s AS (SELECT doc_id, source, " +
        "floor(least(lc, 500) / 5.0 * 0.4 " +
        "  + (CASE WHEN lc::DOUBLE / greatest(ntok, 1) BETWEEN 3 AND 12 THEN 100.0 ELSE 30.0 END) * 0.4 " +
        "  - (floor((lc - np)::DOUBLE / greatest(lc, 1) * 10000) / 100.0) * 0.1 " +
        "  - (floor((lc - nd)::DOUBLE / greatest(lc, 1) * 10000) / 100.0) * 0.1)::BIGINT AS quality FROM q), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rk FROM s) " +
        "SELECT count(*)::BIGINT AS n_selected, count(DISTINCT source)::BIGINT AS n_sources, " +
        "sum(doc_id)::BIGINT AS id_sum, sum(quality)::BIGINT AS quality_sum FROM r WHERE rk <= 3"),
    "topk_heap" ->
      ("WITH q AS (SELECT doc_id, source, " +
        "len(string_split_regex(lower(trim(text)), '\\s+')) AS ntok, " +
        "length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np, " +
        "length(regexp_replace(text, '[0-9]', '', 'g')) AS nd, length(text) AS lc FROM documents), " +
        "s AS (SELECT doc_id, source, " +
        "floor(least(lc, 500) / 5.0 * 0.4 " +
        "  + (CASE WHEN lc::DOUBLE / greatest(ntok, 1) BETWEEN 3 AND 12 THEN 100.0 ELSE 30.0 END) * 0.4 " +
        "  - (floor((lc - np)::DOUBLE / greatest(lc, 1) * 10000) / 100.0) * 0.1 " +
        "  - (floor((lc - nd)::DOUBLE / greatest(lc, 1) * 10000) / 100.0) * 0.1)::BIGINT AS quality FROM q), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rk FROM s) " +
        "SELECT count(*)::BIGINT AS n_selected, count(DISTINCT source)::BIGINT AS n_sources, " +
        "sum(doc_id)::BIGINT AS id_sum, sum(quality)::BIGINT AS quality_sum FROM r WHERE rk <= 3"),
    "moving_avg" ->
      ("WITH v AS (SELECT user_id, ts, event_id, round(value * 100)::BIGINT AS v100 FROM events), " +
        "m AS (SELECT floor(sum(v100) OVER w::DOUBLE / count(*) OVER w)::BIGINT AS ma FROM v " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) " +
        "SELECT count(*)::BIGINT AS n, sum(ma)::BIGINT AS ma_sum, max(ma)::BIGINT AS ma_max FROM m"),
    "set_ops" ->
      ("WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'), " +
        "b AS (SELECT user_id FROM c INTERSECT SELECT user_id FROM p), " +
        "o AS (SELECT user_id FROM c EXCEPT SELECT user_id FROM p) " +
        "SELECT (SELECT count(*) FROM b)::BIGINT AS n_both, " +
        "(SELECT coalesce(sum(user_id), 0) FROM b)::BIGINT AS both_sum, " +
        "(SELECT count(*) FROM o)::BIGINT AS n_only, " +
        "(SELECT coalesce(sum(user_id), 0) FROM o)::BIGINT AS only_sum"),
    "pivot_agg" ->
      ("SELECT l_returnflag AS rf, " +
        "count(*) FILTER (l_linestatus = 'F')::BIGINT AS n_f, " +
        "count(*) FILTER (l_linestatus = 'O')::BIGINT AS n_o " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY rf"),
    "approx_agg" ->
      "SELECT 1::BIGINT AS hll_in_bound, 1::BIGINT AS p50_in_range, 1::BIGINT AS one",
    "asof_join" ->
      ("WITH s AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') " +
        "SELECT count(*)::BIGINT AS n, count(s.event_id)::BIGINT AS n_matched, " +
        "coalesce(sum(s.event_id), 0)::BIGINT AS matched_id_sum " +
        "FROM events e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts >= s.ts"),
    "range_join" ->
      ("SELECT count(*)::BIGINT AS n_pairs, coalesce(sum(l.l_orderkey), 0)::BIGINT AS order_sum, " +
        "coalesce(sum(p.p_partkey), 0)::BIGINT AS part_sum " +
        "FROM lineitem l JOIN part p ON l.l_extendedprice BETWEEN p.p_retailprice - 5 AND p.p_retailprice + 5"),
    // brute-force overlap join the binned operator must reproduce exactly
    "interval_overlap_join" ->
      ("WITH a AS (SELECT l_orderkey * 10 + l_linenumber AS a_id, " +
        "epoch_us(l_shipdate) // 86400000000 AS a_lo, " +
        "epoch_us(l_shipdate) // 86400000000 + l_quantity::BIGINT AS a_hi " +
        "FROM lineitem WHERE l_orderkey % 97 = 0), " +
        "b AS (SELECT l_orderkey * 10 + l_linenumber AS b_id, " +
        "epoch_us(l_shipdate) // 86400000000 AS b_lo, " +
        "epoch_us(l_shipdate) // 86400000000 + l_quantity::BIGINT AS b_hi " +
        "FROM lineitem WHERE l_orderkey % 97 = 1) " +
        "SELECT count(*)::BIGINT AS n_pairs, " +
        "coalesce(sum(a_id + b_id), 0)::BIGINT AS id_sum, " +
        "coalesce(sum(greatest(a_lo, b_lo)), 0)::BIGINT AS start_sum " +
        "FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi"),
    "events_props" ->
      ("SELECT event_type, count(*)::BIGINT AS n, " +
        "sum(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS k_sum, " +
        "count(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS n_k_nonnull " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "sink_roundtrip" ->
      "SELECT lang, count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum FROM documents GROUP BY lang ORDER BY lang",
    "orc_roundtrip" ->
      ("SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars_sum, " +
        "sum(doc_id)::BIGINT AS id_sum FROM documents WHERE lang IN ('en', 'zh') " +
        "GROUP BY lang ORDER BY lang"),
    "csv_roundtrip" ->
      ("SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars_sum, " +
        "sum(doc_id)::BIGINT AS id_sum FROM documents WHERE lang IN ('en', 'zh') " +
        "GROUP BY lang ORDER BY lang"),
    "json_roundtrip" ->
      ("SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars_sum, " +
        "max(n_chars)::BIGINT AS chars_max FROM documents GROUP BY lang ORDER BY lang"),
    "window_lead_lag" ->
      ("WITH w AS (SELECT user_id, event_id, " +
        "lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id, " +
        "lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_id, " +
        "ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile FROM events) " +
        "SELECT count(*)::BIGINT AS n, count(prev_id)::BIGINT AS n_prev, " +
        "coalesce(sum(prev_id), 0)::BIGINT AS prev_sum, coalesce(sum(next_id), 0)::BIGINT AS next_sum, " +
        "sum(quartile)::BIGINT AS quartile_sum FROM w"),
    "latest_per_key" ->
      ("WITH k AS (SELECT user_id, event_id, value, epoch_ms(ts) * 1048576 + event_id AS ord FROM events), " +
        "l AS (SELECT user_id, arg_max(event_id, ord) AS last_id, arg_max(value, ord) AS last_value " +
        "FROM k GROUP BY user_id) " +
        "SELECT count(*)::BIGINT AS n_users, sum(last_id)::BIGINT AS id_sum, " +
        "sum(round(last_value * 100))::BIGINT AS value_sum FROM l"),
    "exact_percentile" ->
      ("SELECT l_returnflag AS rf, round(quantile_cont(l_quantity * 100, 0.5) * 2)::BIGINT AS med2, " +
        "round(quantile_cont(l_quantity * 100, 0.9) * 10)::BIGINT AS p90x10 " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
    "decontaminate" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), " +
        "g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 8 + 2), i -> array_to_string(toks[i:i+7], ' '))) AS gram " +
        "FROM t WHERE len(toks) >= 8), " +
        "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0), " +
        "cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)) " +
        "SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs, " +
        "(SELECT count(*) FROM cont)::BIGINT AS n_contaminated, " +
        "((SELECT count(*) FROM documents) - (SELECT count(*) FROM cont))::BIGINT AS n_kept, " +
        "(SELECT coalesce(sum(doc_id), 0) FROM cont)::BIGINT AS cont_id_sum"),
    // same planted lines; first-occurrence keep order via index-aware filter
    "dedup_lines" ->
      ("WITH t AS (SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 THEN chr(10) || text ELSE '' END " +
        "|| chr(10) || 'tail ' || doc_id AS text FROM documents), " +
        "l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM t) " +
        "SELECT doc_id, len(lines)::BIGINT AS n_lines_before, " +
        "len(list_filter(lines, (x, i) -> list_position(lines, x) = i))::BIGINT AS n_lines_after, " +
        "array_to_string(list_filter(lines, (x, i) -> list_position(lines, x) = i), chr(10)) AS clean_text " +
        "FROM l ORDER BY doc_id"),
    // exact jaccard between the planted batch and the corpus
    "dedup_incremental" -> incrementalOracleSql,
    // the indexed variant must flag EXACTLY the same pairs - shared oracle
    "dedup_sig_reuse" -> incrementalOracleSql,
    // and so must the STREAMING probe of the same planted batch
    "stream_dedup_probe" -> incrementalOracleSql,
    // exact-jaccard component graph, histogram of component sizes
    "dedup_cluster_report" ->
      ("WITH sh AS (SELECT doc_id, list_distinct([text[i:i+4] FOR i IN range(1, greatest(len(text)-3, 1))]) AS s FROM documents), " +
        "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "len(list_intersect(a.s, b.s))::DOUBLE / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id), " +
        "e AS (SELECT id_a AS a, id_b AS b FROM p WHERE j >= 0.8 UNION SELECT id_b, id_a FROM p WHERE j >= 0.8), " +
        "reach AS (WITH RECURSIVE r(a, b) AS (SELECT a, b FROM e " +
        "UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a WHERE r.a <> e.b) SELECT * FROM r), " +
        "comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a), " +
        "sizes AS (SELECT component, count(*) AS sz FROM comp GROUP BY component) " +
        "SELECT sz::BIGINT AS sz, count(*)::BIGINT AS n_clusters FROM sizes GROUP BY sz ORDER BY sz"),
    // same normalization regexes, min doc_id per normalized-content group
    "dedup_normalized" ->
      ("WITH allv AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 4000000000000, upper(text) || '  ' FROM documents WHERE doc_id % 40 = 0), " +
        "n AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[\\x00-\\x1f\\x7f]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm FROM allv), " +
        "k AS (SELECT min(doc_id) AS keep FROM n GROUP BY norm) " +
        "SELECT (SELECT count(*) FROM allv)::BIGINT AS n_total, " +
        "(SELECT count(*) FROM k)::BIGINT AS n_kept, " +
        "(SELECT sum(keep) FROM k)::BIGINT AS kept_id_sum"),
    // truth by plain text-equality join; min matching corpus id per new doc
    "dedup_exact_incremental" ->
      ("WITH newb AS (SELECT doc_id + 2000000000000 AS new_id, text AS t FROM documents WHERE doc_id % 25 = 0 " +
        "UNION ALL SELECT doc_id + 3000000000000 AS new_id, text || ' changed' AS t FROM documents WHERE doc_id % 25 = 1), " +
        "m AS (SELECT n.new_id, min(d.doc_id) AS corpus_id FROM newb n JOIN documents d ON n.t = d.text GROUP BY n.new_id) " +
        "SELECT (SELECT count(*) FROM newb)::BIGINT AS n_new, " +
        "(SELECT count(*) FROM m)::BIGINT AS n_flagged, " +
        "(SELECT coalesce(sum(new_id + corpus_id), 0) FROM m)::BIGINT AS pair_id_sum"),
    // same whitespace bigrams, same (count desc, pair) cutoff
    "bpe_pair_counts" ->
      ("WITH t AS (SELECT string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), " +
        "bg AS (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS pair " +
        "FROM t WHERE len(toks) >= 2) " +
        "SELECT pair, count(*)::BIGINT AS n FROM bg GROUP BY pair ORDER BY n DESC, pair LIMIT 20"),
    // ground-truth language labels for the planted held-out sentences —
    // the classifier must reproduce them exactly (incl. es/pt and sv/da)
    "langid_profile" ->
      ("SELECT doc_id::BIGINT AS doc_id, lang FROM (VALUES " +
        "(1, 'en'), (2, 'en'), (3, 'de'), (4, 'de'), (5, 'fr'), (6, 'fr'), " +
        "(7, 'es'), (8, 'es'), (9, 'pt'), (10, 'pt'), (11, 'it'), (12, 'it'), " +
        "(13, 'nl'), (14, 'nl'), (15, 'sv'), (16, 'sv'), (17, 'da'), (18, 'da'), " +
        "(19, 'pl'), (20, 'pl'), (21, 'tr'), (22, 'tr'), " +
        "(23, 'zh'), (24, 'zh'), (25, 'zh'), (26, 'ja'), (27, 'ja'), " +
        "(28, 'ko'), (29, 'ko'), (30, 'ru'), (31, 'ru'), (32, 'ar'), " +
        "(33, 'ar'), (34, 'hi'), (35, 'hi')) AS t(doc_id, lang) " +
        "ORDER BY doc_id"),
    // the full 20-round greedy trainer replayed in one recursive CTE
    "bpe_train" ->
      (s"WITH RECURSIVE $bpeTrainCte " +
        "SELECT rank, a AS lhs, b AS rhs, n FROM merges ORDER BY rank"),
    // the byte arm's identical recursion over DuckDB's own UTF-8 byte
    // dump (encode/hex/substr), raw case-preserved whitespace words
    "bpe_train_bytes" ->
      (s"WITH RECURSIVE ${bpeByteTrainCteFor("documents", 12)} " +
        "SELECT rank, a AS lhs, b AS rhs, n FROM merges ORDER BY rank"),
    // byte-encode replay: fixed 256-symbol vocab head (printf hex) +
    // merge products, per-doc token/byte counts and the order-sensitive
    // sum(pos * token_id) checksum
    "bpe_encode_bytes" ->
      (s"WITH RECURSIVE ${bpeByteEncodeCteFor("documents", 12)}, " +
        "vocab0 AS (SELECT printf('%02x', i) AS token, i::BIGINT AS ord FROM range(256) t(i) " +
        "UNION ALL SELECT a || b, 256 + rank - 1 FROM merges), " +
        "vocab AS (SELECT token, min(ord)::BIGINT AS token_id FROM vocab0 GROUP BY token), " +
        "ex AS (SELECT doc_id, wpos, unnest(range(1, len(f.toks)+1)) AS tpos, unnest(f.toks) AS token " +
        "FROM dw JOIN final f USING (word)), " +
        "px AS (SELECT doc_id, (row_number() OVER (PARTITION BY doc_id ORDER BY wpos, tpos))::BIGINT AS pos, token FROM ex) " +
        "SELECT doc_id, count(*)::BIGINT AS n_tokens, (sum(len(token)) // 2)::BIGINT AS n_bytes, " +
        "sum(pos * v.token_id)::BIGINT AS checksum " +
        "FROM px JOIN vocab v USING (token) GROUP BY doc_id ORDER BY doc_id"),
    // trained merges re-applied to every document word by a second
    // recursion over rank; ids = sorted chars then merge products
    // (first occurrence wins); full per-token value compare
    "bpe_encode" ->
      (s"WITH RECURSIVE $bpeEncodeCte, " +
        "chars AS (SELECT DISTINCT unnest(list_transform(range(1, len(word)+1), i -> word[i])) AS c FROM words), " +
        "vocab0 AS (SELECT c AS token, (row_number() OVER (ORDER BY c)) - 1 AS ord FROM chars " +
        "UNION ALL SELECT a || b, (SELECT count(*) FROM chars) + rank - 1 FROM merges), " +
        "vocab AS (SELECT token, min(ord)::BIGINT AS token_id FROM vocab0 GROUP BY token), " +
        "ex AS (SELECT doc_id, wpos, unnest(range(1, len(f.toks)+1)) AS tpos, unnest(f.toks) AS token " +
        "FROM dw JOIN final f USING (word)) " +
        "SELECT e.doc_id, (row_number() OVER (PARTITION BY e.doc_id ORDER BY e.wpos, e.tpos))::BIGINT AS pos, " +
        "e.token, v.token_id FROM ex e JOIN vocab v USING (token) ORDER BY doc_id, pos"),
    // BPE-count-driven packing: per-doc token counts from the encode
    // replay, then the pack_sequences prefix-sum arithmetic at capacity 512
    "bpe_pack" ->
      (s"WITH RECURSIVE $bpeEncodeCte, " +
        "tc AS (SELECT doc_id, sum(len(f.toks))::BIGINT AS toks " +
        "FROM dw JOIN final f USING (word) GROUP BY doc_id), " +
        "s AS (SELECT doc_id, toks, sum(toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e FROM tc), " +
        "b AS (SELECT doc_id, toks, (e - toks) // 512 AS bin FROM s), " +
        "f2 AS (SELECT bin, count(*) AS bin_docs, sum(toks) AS fill FROM b GROUP BY bin) " +
        "SELECT sum(bin_docs)::BIGINT AS n_docs, sum(fill)::BIGINT AS total_tokens, " +
        "(max(bin) + 1)::BIGINT AS n_bins, max(fill)::BIGINT AS max_bin_fill FROM f2"),
    // identical piece strings, identical (us, event_id) ordering
    "assemble_docs" ->
      ("SELECT user_id AS key, count(*) AS n_pieces, " +
        "string_agg(event_type || ':' || epoch_us(ts), ' ' ORDER BY epoch_us(ts), event_id) AS doc " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    // same pow(n, 1/T) weights, same 1/4096 rate grid, same integer hash
    "temperature_mix" ->
      ("WITH s AS (SELECT doc_id, CASE WHEN doc_id % 7 < 4 THEN 'big' " +
        "WHEN doc_id % 7 < 6 THEN 'mid' ELSE 'small' END AS stratum FROM documents), " +
        "c AS (SELECT stratum, count(*)::DOUBLE AS n FROM s GROUP BY 1), " +
        "w AS (SELECT stratum, n, pow(n, 0.5) AS w FROM c), " +
        "t AS (SELECT sum(w) AS wsum, sum(n) AS total FROM w), " +
        "r AS (SELECT stratum, least(4096, floor(least(1.0, floor(0.5 * t.total) * (w.w / t.wsum) / w.n) * 4096))::BIGINT * 1048576 AS cutoff " +
        "FROM w CROSS JOIN t) " +
        "SELECT s.stratum, count(*) AS n_sampled, sum(s.doc_id)::BIGINT AS id_sum " +
        "FROM s JOIN r USING (stratum) " +
        "WHERE (s.doc_id::HUGEINT * 2654435761) % 4294967296 < r.cutoff " +
        "GROUP BY 1 ORDER BY 1"),
    // same pow/grid-snap/hash arithmetic replayed per epoch
    "curriculum_mix" ->
      ("WITH e(epoch, alpha) AS (VALUES (1, 1.0), (2, 0.5), (3, 0.25)), " +
        "c AS (SELECT source, count(*)::DOUBLE AS n FROM documents GROUP BY 1), " +
        "w AS (SELECT e.epoch, c.source, c.n, pow(c.n, e.alpha) AS w FROM c CROSS JOIN e), " +
        "t AS (SELECT epoch, sum(w) AS wsum, sum(n) AS total FROM w GROUP BY epoch), " +
        "r AS (SELECT w.epoch, w.source, least(4096, floor(least(1.0, floor(0.3 * t.total) * (w.w / t.wsum) / w.n) * 4096))::BIGINT * 1048576 AS cutoff " +
        "FROM w JOIN t ON w.epoch = t.epoch) " +
        "SELECT r.epoch, d.source, count(*)::BIGINT AS n_sampled, sum(d.doc_id)::BIGINT AS id_sum " +
        "FROM documents d JOIN r ON d.source = r.source " +
        "WHERE (d.doc_id::HUGEINT * 2654435761) % 4294967296 < r.cutoff GROUP BY 1, 2"),
    // every observed metric and pass bit recomputed (one failing check
    // included by design: n_chars in [0,400] with long docs present)
    "quality_checks" ->
      ("SELECT 'not_null' AS \"check\", 'text' AS \"column\", " +
        "count(CASE WHEN text IS NULL THEN 1 END)::BIGINT AS observed, 0::BIGINT AS expected_lo, 0::BIGINT AS expected_hi, " +
        "(count(CASE WHEN text IS NULL THEN 1 END) = 0)::BIGINT AS pass FROM documents " +
        "UNION ALL SELECT 'unique', 'doc_id', (count(doc_id) - count(DISTINCT doc_id))::BIGINT, 0, 0, " +
        "(count(doc_id) = count(DISTINCT doc_id))::BIGINT FROM documents " +
        "UNION ALL SELECT 'in_range', 'n_chars', count(CASE WHEN n_chars < 0 OR n_chars > 1000 THEN 1 END)::BIGINT, 0, 0, " +
        "(count(CASE WHEN n_chars < 0 OR n_chars > 1000 THEN 1 END) = 0)::BIGINT FROM documents " +
        "UNION ALL SELECT 'in_range', 'n_chars', count(CASE WHEN n_chars < 0 OR n_chars > 400 THEN 1 END)::BIGINT, 0, 0, " +
        "(count(CASE WHEN n_chars < 0 OR n_chars > 400 THEN 1 END) = 0)::BIGINT FROM documents " +
        "UNION ALL SELECT 'accepted_values', 'lang', count(CASE WHEN lang IS NOT NULL AND lang NOT IN ('de','en','es','fr','zh') THEN 1 END)::BIGINT, 0, 0, " +
        "(count(CASE WHEN lang IS NOT NULL AND lang NOT IN ('de','en','es','fr','zh') THEN 1 END) = 0)::BIGINT FROM documents " +
        "UNION ALL SELECT 'row_count', '*', count(*)::BIGINT, 1, 10000000, " +
        "(count(*) BETWEEN 1 AND 10000000)::BIGINT FROM documents"),
    // same count/tie-break/integer-share arithmetic; keys compare as strings
    "skew_report" ->
      ("WITH c AS (SELECT user_id::VARCHAR AS key, count(*) AS n FROM events GROUP BY 1), " +
        "t AS (SELECT sum(n) AS total FROM c) " +
        "SELECT key, n::BIGINT AS n, (n * 10000 // t.total)::BIGINT AS share_x1e4 " +
        "FROM c, t ORDER BY n DESC, key LIMIT 10"),
    // full per-doc recompute: same top-20 vocab (count DESC, token ASC),
    // same integer-division OOV rate
    "vocab_coverage" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM documents), " +
        "tf AS (SELECT tok, count(*) AS n FROM toks WHERE tok != '' GROUP BY tok), " +
        "v AS (SELECT tok FROM tf ORDER BY n DESC, tok LIMIT 20), " +
        "pd AS (SELECT t.doc_id, count(*) AS n_tokens, count(CASE WHEN v.tok IS NULL THEN 1 END) AS n_oov " +
        "FROM toks t LEFT JOIN v ON t.tok = v.tok WHERE t.tok != '' GROUP BY t.doc_id) " +
        "SELECT d.doc_id, coalesce(pd.n_tokens, 0)::BIGINT AS n_tokens, " +
        "coalesce(pd.n_oov, 0)::BIGINT AS n_oov, " +
        "coalesce(pd.n_oov * 10000 // pd.n_tokens, 0)::BIGINT AS oov_x1e4 " +
        "FROM documents d LEFT JOIN pd USING (doc_id)"),
    // the planted day-1 snapshot replayed: same subset, same appended
    // boilerplate, same ppm integer grid, same (delta DESC, token) argmax
    "vocab_drift" -> vocabDriftOracleSql,
    // shared verbatim: the histogram store cycle must not change one stat
    "vocab_drift_store" -> vocabDriftOracleSql,
    // old files read the evolved column as null; only odd doc_ids carry it
    "schema_evolution" ->
      ("SELECT count(*)::BIGINT AS n_rows, " +
        "count(CASE WHEN doc_id % 2 = 1 THEN 1 END)::BIGINT AS n_evolved, " +
        "coalesce(sum(CASE WHEN doc_id % 2 = 1 THEN doc_id * 7 END), 0)::BIGINT AS quality_sum, " +
        "count(DISTINCT lang)::BIGINT AS n_langs FROM documents"),
    "histogram_stats" ->
      ("SELECT least(floor(l_extendedprice / 10000), 10)::BIGINT AS bucket, " +
        "count(*) AS n, sum(round(l_extendedprice * 100, 0))::BIGINT AS cent_sum " +
        "FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1 ORDER BY 1"),
    // identical integer sufficient statistics + closed-form double combine
    "corr_stats" ->
      ("WITH g AS (SELECT round(l_quantity, 0)::BIGINT AS x, round(l_discount * 100, 0)::BIGINT AS y " +
        "FROM lineitem WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL), " +
        "s AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy, " +
        "sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy, sum(x * y)::BIGINT AS sxy FROM g) " +
        "SELECT n, sx, sy, sxx, syy, sxy, " +
        "floor((n * sxy - sx * sy)::DOUBLE / " +
        "(sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE)) * 1e9)::BIGINT AS corr_x1e9 FROM s"),
    // exact recovery of the 8 planted orthogonal clusters (240 vectors)
    "kmeans_cluster" ->
      ("SELECT 240::BIGINT AS n_vectors, 8::BIGINT AS n_lists_used, " +
        "240::BIGINT AS n_majority, 10000::BIGINT AS purity_x1e4"),
    // exact-path numbers; the bloom path must agree exactly (n_mismatch=0)
    "decontaminate_bloom" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents), " +
        "g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 8 + 2), i -> array_to_string(toks[i:i+7], ' '))) AS gram " +
        "FROM t WHERE len(toks) >= 8), " +
        "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0), " +
        "cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)) " +
        "SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs, " +
        "(SELECT count(*) FROM cont)::BIGINT AS n_contaminated, " +
        "(SELECT coalesce(sum(doc_id), 0) FROM cont)::BIGINT AS cont_id_sum, " +
        "0::BIGINT AS n_mismatch"),
    "hash_sample" ->
      ("SELECT source, count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum FROM documents " +
        "WHERE (doc_id::HUGEINT * 2654435761) % 4294967296 < " +
        "(CASE source WHEN 'src0' THEN 4294967296 WHEN 'src1' THEN 2147483648 " +
        "WHEN 'src2' THEN 858993459 WHEN 'src3' THEN 214748364 ELSE 0 END) " +
        "GROUP BY source ORDER BY source"),
    "pack_sequences" ->
      ("WITH t AS (SELECT doc_id, len(string_split_regex(lower(trim(text)), '\\s+'))::BIGINT AS toks FROM documents), " +
        "s AS (SELECT doc_id, toks, sum(toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e FROM t), " +
        "b AS (SELECT doc_id, toks, e, (e - toks) // 2048 AS bin, " +
        "(e - 1) // 2048 - (e - toks) // 2048 + 1 AS n_chunks FROM s), " +
        "f AS (SELECT bin, sum(toks) AS fill FROM b GROUP BY bin) " +
        "SELECT (SELECT count(*) FROM b)::BIGINT AS n_docs, " +
        "(SELECT sum(toks) FROM b)::BIGINT AS total_tokens, " +
        "(SELECT (sum(toks) + 2047) // 2048 FROM b)::BIGINT AS n_seqs, " +
        "(SELECT count(*) FROM b WHERE n_chunks > 1)::BIGINT AS n_straddlers, " +
        "(SELECT max(bin) + 1 FROM b)::BIGINT AS n_bins, " +
        "(SELECT max(fill) FROM f)::BIGINT AS max_bin_fill"),
    "multimodal_video" ->
      ("WITH t AS (SELECT doc_id, (3 + doc_id % 7 + 1) // 2 AS c FROM documents) " +
        "SELECT sum(c)::BIGINT AS n_frames_sampled, count(*)::BIGINT AS n_videos, " +
        "sum(c)::BIGINT AS n_real, sum(c * (c - 1))::BIGINT AS frame_index_sum, " +
        "sum(c)::BIGINT AS n_payload_exact FROM t"),
    "multimodal_resize" ->
      ("SELECT count(*) AS n, count(*) AS n_png, " +
        "sum(1 + doc_id % 16)::BIGINT AS width_sum, sum(1 + doc_id % 12)::BIGINT AS height_sum, " +
        "count(*) AS n_mean_exact, count(*) AS n_std_zero FROM documents"),
    "multimodal_audio" ->
      ("SELECT count(*) AS n, count(*) AS n_wav, " +
        "sum(64 + doc_id % 256)::BIGINT AS frames_sum, sum(1 + doc_id % 2)::BIGINT AS channels_sum, " +
        "sum((64 + doc_id % 256) // 8)::BIGINT AS duration_sum, " +
        "count(*) AS n_mean_exact, count(*) AS n_rms_exact, count(*) AS n_flat FROM documents"),
    "multimodal_audio_resample" ->
      ("SELECT count(*) AS n, count(*) AS n_wav, " +
        "sum(((64 + doc_id % 256) * 12000) // 8000)::BIGINT AS frames_sum, " +
        "sum(1 + doc_id % 2)::BIGINT AS channels_sum, " +
        "count(*) AS n_dc_exact, count(*) AS n_flat FROM documents"),
    "events_window" ->
      ("SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS ws_epoch, event_type, count(*) AS n " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "stream_stream_join" ->
      ("SELECT count(*)::BIGINT AS n_pairs, coalesce(sum(c.event_id), 0)::BIGINT AS click_id_sum, " +
        "coalesce(sum(p.event_id), 0)::BIGINT AS purchase_id_sum " +
        "FROM events c JOIN events p ON c.user_id = p.user_id " +
        "AND c.event_type = 'click' AND p.event_type = 'purchase' " +
        "AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE"),
    // matched pairs = the batch interval join; unmatched = the batch
    // anti-join restricted to the 2-day safety band before corpus end
    "stream_join_outer" ->
      ("WITH c AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'), " +
        "m AS (SELECT c.event_id FROM c JOIN p ON c.user_id = p.user_id " +
        "AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE), " +
        "u AS (SELECT c.event_id FROM c WHERE NOT EXISTS (SELECT 1 FROM p " +
        "WHERE p.user_id = c.user_id AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE) " +
        "AND epoch_us(c.ts) < (SELECT max(epoch_us(ts)) FROM events) - 172800000000) " +
        "SELECT (SELECT count(*) FROM m)::BIGINT AS n_pairs, " +
        "(SELECT coalesce(sum(event_id), 0) FROM m)::BIGINT AS matched_click_id_sum, " +
        "(SELECT count(*) FROM u)::BIGINT AS n_unconverted_old, " +
        "(SELECT coalesce(sum(event_id), 0) FROM u)::BIGINT AS unconverted_id_sum"),
    "events_window_stream" ->
      ("SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS ws_epoch, event_type, count(*) AS n " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    // k-1 self-join recompute of the funnel the operator does in one fold
    "events_funnel" ->
      ("WITH t1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id), " +
        "t2 AS (SELECT e.user_id AS user_id, min(epoch_us(e.ts)) AS t2 FROM events e JOIN t1 ON e.user_id = t1.user_id " +
        "WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1 GROUP BY e.user_id), " +
        "t3 AS (SELECT e.user_id AS user_id, min(epoch_us(e.ts)) AS t3 FROM events e JOIN t2 ON e.user_id = t2.user_id " +
        "WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2 GROUP BY e.user_id), " +
        "u AS (SELECT DISTINCT user_id FROM events), " +
        "j AS (SELECT u.user_id, t1.t1, t2.t2, t3.t3 FROM u LEFT JOIN t1 ON u.user_id = t1.user_id " +
        "LEFT JOIN t2 ON u.user_id = t2.user_id LEFT JOIN t3 ON u.user_id = t3.user_id) " +
        "SELECT count(*)::BIGINT AS n_users, count(t1)::BIGINT AS n_step1, count(t2)::BIGINT AS n_step2, " +
        "count(t3)::BIGINT AS n_step3, coalesce(sum(t2 - t1), 0)::BIGINT AS lat12_sum, " +
        "coalesce(sum(t3 - t1), 0)::BIGINT AS lat13_sum, " +
        "coalesce(sum(CASE WHEN t3 IS NOT NULL THEN user_id END), 0)::BIGINT AS converted_user_sum FROM j"),
    // naive min-join recompute of the retention triangle the operator
    // derives from one groupBy-user pass
    "cohort_retention" ->
      ("WITH p AS (SELECT user_id, epoch_us(ts) // 86400000000 AS p FROM events), " +
        "f AS (SELECT user_id, min(p) AS cohort FROM p GROUP BY user_id), " +
        "a AS (SELECT DISTINCT user_id, p FROM p), " +
        "j AS (SELECT f.cohort, a.p - f.cohort AS off, a.user_id FROM a JOIN f ON a.user_id = f.user_id) " +
        "SELECT cohort, off AS \"offset\", count(*)::BIGINT AS n_users FROM j GROUP BY cohort, off"),
    // the rank-error and membership contracts are structural (checked
    // in-plan with integer arithmetic); N pins the sketch ran over all rows
    "quantile_sketch" ->
      ("SELECT count(*)::BIGINT AS n, 1::BIGINT AS ok_q25, 1::BIGINT AS ok_q50, " +
        "1::BIGINT AS ok_q75, 1::BIGINT AS ok_q99, 1::BIGINT AS ok_member FROM documents"),
    "events_sessions" ->
      ("WITH l AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events), " +
        "f AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1 ELSE 0 END AS ns FROM l), " +
        "s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM f), " +
        "g AS (SELECT user_id, sid, count(*) AS cnt FROM s GROUP BY 1, 2) " +
        "SELECT count(*) AS n_sessions, sum(cnt)::BIGINT AS n_events_total, max(cnt)::BIGINT AS max_session_events FROM g"),
    // session_window's half-open windows: a gap of EXACTLY the duration
    // starts a new session, hence >= (vs the custom operator's >)
    "session_window_agg" ->
      ("WITH l AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events), " +
        "f AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) >= 1800000 THEN 1 ELSE 0 END AS ns FROM l), " +
        "s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM f), " +
        "g AS (SELECT user_id, sid, count(*) AS cnt FROM s GROUP BY 1, 2) " +
        "SELECT count(*) AS n_sessions, sum(cnt)::BIGINT AS n_events_total, max(cnt)::BIGINT AS max_session_events FROM g"),
    "stream_foreach_batch" ->
      ("SELECT count(*)::BIGINT AS n, sum(event_id)::BIGINT AS id_sum, " +
        "sum(round(value * 100))::BIGINT AS value_sum FROM events WHERE event_type = 'purchase'"),
    "events_sessions_stream" ->
      ("WITH l AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events), " +
        "f AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000 THEN 1 ELSE 0 END AS ns FROM l), " +
        "s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM f), " +
        "g AS (SELECT user_id, sid, count(*) AS cnt, max(ts) AS send FROM s GROUP BY 1, 2), " +
        "e AS (SELECT *, max(sid) OVER (PARTITION BY user_id) AS last_sid FROM g), " +
        "em AS (SELECT * FROM e WHERE sid < last_sid OR epoch_ms(send) + 1800000 <= (SELECT max(epoch_ms(ts)) - 600000 FROM events)) " +
        "SELECT count(*) AS n_sessions, sum(cnt)::BIGINT AS n_events_total, max(cnt)::BIGINT AS max_session_events FROM em"),
    "lineitem_agg" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, " +
        "round(sum(l_quantity::DECIMAL(12,2)) * 100)::BIGINT AS sum_qty_x100, " +
        "round(sum(l_extendedprice::DECIMAL(14,2)) * 100)::BIGINT AS sum_price_x100, " +
        "round(sum((l_extendedprice::DECIMAL(14,2) * (1 - l_discount::DECIMAL(3,2)))::DECIMAL(18,4)) * 10000)::BIGINT AS sum_disc_price_x10000 " +
        "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),
    "join_agg" ->
      ("SELECT c_mktsegment, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1"),
    "join_agg_bucketed" ->
      ("SELECT c_mktsegment, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1"),
    "window_top_order" ->
      ("WITH r AS (SELECT o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
        "SELECT count(*) AS n_top, sum(o_orderkey)::BIGINT AS top_orderkey_sum FROM r WHERE rn = 1")
  )

}
