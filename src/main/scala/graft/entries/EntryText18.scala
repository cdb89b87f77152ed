package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query registry: round-18 batch 2 — sentence-level text pipeline
  * ([[graft.operators.Sentences]]), CCNet-style per-language LM quality
  * bucketing, and URL-shape spam scoring ([[graft.operators.UrlSpam]]). */
private[graft] trait EntryText18 { this: EntryCore =>

  /** The planted document used by the two sentence queries: real corpus
    * words wrapped in sentence structure that exercises every segmentation
    * rule — abbreviation periods (`Dr. Mrs.`), a dotted pair (`e.g.`), a
    * decimal point (`3.14`), Latin terminators `.!?` and the no-whitespace
    * CJK terminators `。！`. */
  private def sentenceDoc: Column = concat(
    lit("Intro words "), substring(col("text"), 1, 40), lit(". "),
    lit("Dr. Smith replied to Mrs. Jones! "),
    lit("Was it version 3.14 of "), col("lang"), lit("? "),
    lit("句子一。这是第二句！"),
    lit("Tail from "), col("source"), lit(" e.g. the end"))

  /** Sentence segmentation — [[graft.operators.Sentences.splitSentences]]
    * over the planted six-sentence document. FULL-VALUE oracle: the six
    * expected sentences are constructed directly from (text, lang, source)
    * — the oracle does NOT replay the regex chain, it asserts the
    * segmentation contract from first principles (abbreviations and the
    * decimal stay inside their sentences; CJK splits without whitespace;
    * the unterminated tail is still a sentence). */
  private[graft] def qSentenceSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Partitioning.spread(table(spark, dir, "documents"))
    docs.select(col("doc_id"), sentenceDoc.as("t"))
      .select(col("doc_id"),
        posexplode(graft.operators.Sentences.splitSentences(col("t"))))
      .select(col("doc_id"), col("pos").cast("long").as("sentence_idx"),
        col("col").as("sentence"))
  }

  /** Sentence-level exact dedup — the CCNet/RefinedWeb paragraph-dedup
    * move at sentence granularity: segment, count each distinct sentence
    * corpus-wide, CUT every sentence that occurs more than once (the
    * planted slogan arm collides by `doc_id % 7`; "Dr. Smith..." collides
    * everywhere), and rebuild documents from the surviving sentences.
    * Plan shape: segmentation is a narrow projection; the duplicate count
    * is one hash aggregate on the sentence key joined back by key — the
    * [[graft.operators.Dedup]] discipline, never all-pairs. */
  private[graft] def qSentenceDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Partitioning.spread(table(spark, dir, "documents"))
    val composed = docs.select(col("doc_id"), concat(
      lit("Unique lead "), substring(col("text"), 1, 30), lit(" of doc "),
      col("doc_id"), lit(". "),
      lit("Shared slogan number "), pmod(col("doc_id"), lit(7L)),
      lit(" appears often! "),
      lit("Dr. Smith replied. "),
      lit("Tail source "), col("source"), lit(" closes doc "), col("doc_id"),
      lit(".")).as("t"))
    val sent = composed.select(col("doc_id"),
        posexplode(graft.operators.Sentences.splitSentences(col("t"))))
      .select(col("doc_id"), col("pos").as("idx"), col("col").as("sentence"))
    val counts = sent.groupBy("sentence").agg(count(lit(1)).as("cnt"))
    val kept = sent.join(counts, "sentence").where(col("cnt") === 1)
    kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", array_sort(collect_list(struct(col("idx"), col("sentence"))))
          .getField("sentence")).as("kept_text"))
      .join(composed.select(col("doc_id")), Seq("doc_id"), "right")
      .select(col("doc_id"), coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** CCNet-style quality bucketing: language from the Cavnar–Trenkle
    * profile ranker ([[graft.operators.LangId]] — the planted-prefix arm
    * by `doc_id % 4` covers en plus the three non-Latin scripts ru/zh/ar,
    * so the r18 profiles are LOAD-BEARING), per-document score from the
    * corpus-trained bigram LM ([[graft.operators.LanguageModel]]), then
    * head/middle/tail tertiles PER LANGUAGE.
    *
    * The tertile assignment is the 100-TB shape, not a per-doc global
    * sort: build the per-language (score -> count) HISTOGRAM (one hash
    * aggregate; distinct integer scores, not documents), window over the
    * histogram for cutoffs, broadcast-join the bucket back by (lang,
    * score). A score group straddling a cutoff promotes whole into the
    * better bucket — deterministic, and exactly replayable in SQL. */
  /** The four planted language-arm prefixes (en/ru/zh/ar by doc_id % 4)
    * — shared by `lm_quality_buckets` and `quality_gate`; the r18
    * non-Latin profiles are load-bearing for arms 1–3. */
  private def langArmOf(id: Column): Column =
    when(pmod(id, lit(4L)) === 0,
        lit("the quick brown fox jumps over the lazy dog near the river bank today"))
      .when(pmod(id, lit(4L)) === 1,
        lit("в этом документе говорится о последних новостях и погоде в москве сегодня вечером"))
      .when(pmod(id, lit(4L)) === 2,
        lit("这是一个关于新闻和天气的中文文档今天晚上在北京发布的内容"))
      .otherwise(
        lit("هذه وثيقة باللغة العربية عن الأخبار والطقس في المساء اليوم"))

  private[graft] def qLmQualityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Partitioning.spread(table(spark, dir, "documents"))
    val planted = langArmOf(col("doc_id"))
    val composed = docs.select(col("doc_id"),
      concat(planted, lit(" "), substring(col("text"), 1, 40)).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val langs = composed.select(col("doc_id"),
      graft.operators.LangId.langid(col("t")).as("lang"))
    val (bg, uni) = graft.operators.LanguageModel.trainBigramCounts(composed, "t")
    // persist the model tables and the per-doc scored frame: uni's subtree
    // is referenced three times (unigram join, vocab constant, and again
    // through the second perDoc use), and perDoc feeds BOTH the histogram
    // and the final bucket join — unpersisted, the whole train+score
    // pipeline executed twice (59 Exchanges in the before-plan,
    // plans/r18/lm_quality_buckets_before.txt)
    bg.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    uni.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scored = graft.operators.LanguageModel
      .scoreBigrams(composed, "doc_id", "t", bg, uni)
    val perDoc = langs.join(scored, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = perDoc.groupBy("lang", "avg_logp_x1e4")
      .agg(count(lit(1)).as("cnt"))
    val wDesc = Window.partitionBy("lang").orderBy(col("avg_logp_x1e4").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cutoffs = hist
      .withColumn("cum", sum(col("cnt")).over(wDesc))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("lang")))
      .withColumn("start", col("cum") - col("cnt"))
      .withColumn("bucket",
        when(col("start") < floor((col("n") + 2) / lit(3.0)).cast("long"), lit("head"))
          .when(col("start") < floor((col("n") * 2 + 2) / lit(3.0)).cast("long"),
            lit("middle"))
          .otherwise(lit("tail")))
      .select(col("lang"), col("avg_logp_x1e4"), col("bucket"))
    graft.operators.Partitioning.releaseAfterUse(
      perDoc.join(broadcast(cutoffs), Seq("lang", "avg_logp_x1e4"))
        .select(col("doc_id"), col("lang"), col("n_bigrams"),
          col("avg_logp_x1e4"), col("bucket")),
      composed, bg, uni, perDoc)
  }

  /** Interpolated Kneser–Ney trigram scoring
    * ([[graft.operators.LanguageModel.trainKneserNey]]) — the
    * KenLM/CCNet model class with a REAL train/score split: the model
    * trains on ids ≢ 0 mod 3 and scores the FULL corpus, so held-out
    * documents exercise every backoff layer (their word-salad trigrams
    * are mostly unseen → P2/P1 paths; arm 1's per-id token is
    * genuinely OOV for held-out ids → the uniform 1/V̂ floor; arm 0's
    * planted trigram is corpus-common → the highest-order path).
    * FULL-VALUE oracle: DuckDB replays the entire construction —
    * counts, continuation counts, discount interpolation, the 1e4
    * log-grid. */
  private[graft] def qLmKnScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Partitioning.spread(table(spark, dir, "documents"))
    val composed = docs.select(col("doc_id"), concat(
      substring(col("text"), 1, 60), lit(" "),
      when(pmod(col("doc_id"), lit(4L)) === 0, lit("alpha beta gamma"))
        .when(pmod(col("doc_id"), lit(4L)) === 1,
          concat(lit("alpha beta r"), col("doc_id")))
        .when(pmod(col("doc_id"), lit(4L)) === 2, lit("delta epsilon"))
        .otherwise(lit(""))).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = graft.operators.LanguageModel.trainKneserNey(
      composed.where(pmod(col("doc_id"), lit(3L)) =!= 0), "t")
    // persist the two root model tables: tri's trigram explode+count
    // subtree is referenced by FOUR scoring branches (tri/bi/cont/contAgg
    // all derive from it) and uniCont's bigram-type distinct by two —
    // unpersisted, each branch replayed the full training pass (58
    // Exchanges in the before-plan, plans/r18/lm_kn_score_before.txt).
    // The model tables are vocabulary-shaped (the operator's documented
    // materialize-once story); derived aggregates stay lazy on top.
    model.tri.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    model.uniCont.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.Partitioning.releaseAfterUse(
      graft.operators.LanguageModel.scoreKneserNey(
        composed, "doc_id", "t", model),
      composed, model.tri, model.uniCont)
  }

  /** Flesch Reading Ease over composed multi-sentence documents — the
    * classic readability facet of a quality-scoring pipeline, built
    * ENTIRELY from this round's sentence segmenter plus in-row token
    * and vowel-group arithmetic:
    *   FRE·1000 = 206835 − 1015·(words/sentences) − 84600·(syllables/words)
    * with the engine-replayable syllable heuristic syl(w) = max(1,
    * vowelGroups(w) − [w ends in 'e' and has ≥2 groups]). Everything is
    * one narrow projection (segmentation, token array, a transform/
    * aggregate fold for syllables) — no shuffle, no explode. */
  /** (n_sentences, n_words, n_syllables) of a text column — the FRE
    * inputs, shared by `readability_scores` and `quality_gate`. */
  private def freCounts(t: Column): (Column, Column, Column) = {
    val toks = filter(split(trim(lower(t)), "\\s+"), w => length(w) > 0)
    val syl = (w: Column) => greatest(
      regexp_count(w, lit("[aeiouy]+")) -
        when(w.rlike("e$") && regexp_count(w, lit("[aeiouy]+")) >= 2, lit(1))
          .otherwise(lit(0)),
      lit(1)).cast("long")
    (size(graft.operators.Sentences.splitSentences(t)).cast("long"),
      size(toks).cast("long"),
      aggregate(toks, lit(0L), (acc, w) => acc + syl(w)))
  }

  /** FRE·1000 from the three counts (the double-op chain the oracle
    * replays verbatim). */
  private def freX1000(s: Column, w: Column, syl: Column): Column = floor(
    lit(206835.0) -
      lit(1015.0) * w / greatest(s, lit(1L)) -
      lit(84600.0) * syl / greatest(w, lit(1L)) +
      lit(1e-6)).cast("long")

  private[graft] def qReadabilityScores(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Partitioning.spread(table(spark, dir, "documents"))
    val t = concat(lit("The quick start. "), substring(col("text"), 1, 80),
      lit("! Then "), substring(col("text"), 30, 40), lit("?"))
    val (s, w, syl) = freCounts(t)
    docs.select(col("doc_id"), s.as("n_sentences"), w.as("n_words"),
        syl.as("n_syllables"))
      .withColumn("fre_x1000",
        freX1000(col("n_sentences"), col("n_words"), col("n_syllables")))
  }

  /** Quality-gate ENSEMBLE — how production curation actually filters:
    * no single signal decides, a document passes every gate or carries
    * the ordered reasons it failed. Composes three of this round's
    * operators on planted arms: URL-shape spam ([[graft.operators
    * .UrlSpam]] over the five spam arms), script-gated language ID
    * ([[graft.operators.LangId]] over the four language arms — ru/zh/ar
    * detection load-bearing), and Flesch readability (applied only to
    * the en arm: FRE is English-calibrated, gating zh on vowel groups
    * would be noise — the gate is language-CONDITIONAL by design).
    * One narrow projection per doc, no shuffle. FULL-VALUE oracle:
    * spam arithmetic, arm languages, the FRE chain, and the reason
    * string all replay. */
  private[graft] def qQualityGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Partitioning.spread(table(spark, dir, "documents"))
    val id = col("doc_id").cast("long")
    // the id%8==4 half of the en arm appends syllable-dense words so the
    // readability check measurably FIRES (a gate lane that cannot fire
    // is decoration); the suffix is Latin, so the language arm holds
    val t = concat(langArmOf(id), lit(" "), substring(col("text"), 1, 40),
      when(pmod(id, lit(8L)) === 4,
        lit(" extraordinarily unconstitutionally incomprehensibilities revolutionarily"))
        .otherwise(lit("")))
    val (s, w, syl) = freCounts(t)
    val base = docs.select(col("doc_id"),
      graft.operators.UrlSpam.features(spamUrlOf(id)).getField("spam_score")
        .as("spam_score"),
      graft.operators.LangId.langid(t).as("lang"),
      freX1000(s, w, syl).as("fre_x1000"))
    base.withColumn("reasons", concat_ws(",",
        when(col("spam_score") > 8, lit("spam")),
        when(col("lang").isNull, lit("lang")),
        when(coalesce(col("lang") === "en", lit(false)) &&
          col("fre_x1000") < 60000, lit("readability"))))
      .withColumn("kept", col("reasons") === "")
  }

  /** URL-shape spam scoring — [[graft.operators.UrlSpam.features]] over
    * five planted URL arms (clean / tracking-littered / keyword-stuffed
    * throwaway-TLD host / machine-deep path / generated digit host).
    * FULL-VALUE oracle: every feature integer replays from the arm
    * construction with the same string builtins. */
  /** The five planted URL arms (clean / tracking-littered /
    * keyword-stuffed throwaway-TLD host / machine-deep path / generated
    * digit host) — shared by `url_spam_score` and `quality_gate`. */
  private def spamUrlOf(id: Column): Column =
    when(pmod(id, lit(5L)) === 0,
        concat(lit("https://news.example.com/articles/"), id))
      .when(pmod(id, lit(5L)) === 1,
        concat(lit("https://example.com/p/"), id,
          lit("?utm_source=feed&fbclid=x"), id, lit("&ref=tw")))
      .when(pmod(id, lit(5L)) === 2,
        concat(lit("http://best-cheap-pills-"), pmod(id, lit(7L)),
          lit(".win-prizes-online.example.biz/offer/"), id))
      .when(pmod(id, lit(5L)) === 3,
        concat(lit("https://example.org/a/b/c/d/e/f/g/h/"), id, lit("/page")))
      .otherwise(
        concat(lit("http://h"), id, lit("x"), pmod(id * 7, lit(1000L)),
          lit(".example.net/"), id))

  private[graft] def qUrlSpamScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Partitioning.spread(table(spark, dir, "documents"))
    val id = col("doc_id").cast("long")
    docs.select(col("doc_id"), spamUrlOf(id).as("url"))
      .withColumn("f", graft.operators.UrlSpam.features(col("url")))
      .select(col("doc_id"), col("url"), col("f.host").as("host"),
        col("f.n_sub").as("n_sub"), col("f.n_hyphen").as("n_hyphen"),
        col("f.digit_pct").as("digit_pct"), col("f.path_depth").as("path_depth"),
        col("f.n_params").as("n_params"), col("f.n_tracking").as("n_tracking"),
        col("f.spam_score").as("spam_score"))
  }
}
