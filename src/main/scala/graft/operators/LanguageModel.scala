package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet/KenLM-style
  * quality filter: documents whose token transitions are improbable under
  * a model trained on the corpus itself (or a trusted reference corpus)
  * are boilerplate/garbage candidates. This is the statistical complement
  * of [[TextAnalysis]]'s rule-based ratios.
  *
  * Model: add-k smoothed bigram LM.
  *   P(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k * V)
  * where counts come from `train`, V = distinct unigrams in `train`, and
  * the per-document score is the average natural-log probability over the
  * document's bigrams (documents with no bigram score 0 with n_bigrams=0).
  *
  * Scale shape: training is two counting aggregates (one shuffle each,
  * map-side partial); scoring explodes each document's bigrams and joins
  * the count tables on the bigram/unigram keys — plain equi-joins that
  * scale with corpus bigram volume; V and the total-distinct constants
  * travel as a 1-row broadcast. No driver-side model object: the "model"
  * IS a DataFrame, so it can be persisted, versioned and reused like any
  * other table (the same materialize-once story as [[Dedup.bandIndex]]).
  *
  * Scores are emitted as `floor(avg_logp * 1e4 + 1e-6)` integers — the
  * same grid-nudge contract as [[Ranking]] so any engine reproduces them
  * bit-for-bit from the integer counts.
  */
object LanguageModel {

  /** Bigram + unigram count tables from whitespace tokens:
    * (gram, n) with gram = "w1 w2" for bigrams, "w" for unigrams. */
  def trainBigramCounts(train: DataFrame, textCol: String): (DataFrame, DataFrame) = {
    val toks = TextAnalysis.tokens(col(s"`$textCol`"))
    val base = train.select(toks.as("t"))
    val unigrams = base.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val bigrams = base.where(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
    (bigrams, unigrams)
  }

  /** Interpolated Kneser–Ney trigram model — the KenLM/CCNet model
    * class (Kneser & Ney 1995; Chen & Goodman 1999's interpolated
    * variant), upgraded from [[trainBigramCounts]]'s add-k bigram: KN's
    * insight is that LOWER orders should model how many distinct
    * contexts a word CONTINUES ("Francisco" is frequent but only ever
    * follows "San" — its unigram backoff mass should be tiny), so every
    * order below the highest uses continuation counts, and a fixed
    * discount D redistributes mass to the next order down, ending at
    * the uniform 1/V̂ floor (V̂ = vocab + 1 OOV slot — scoring text may
    * contain words training never saw).
    *
    *   P3(w3|w1w2) = max(c3−D,0)/c2(w1w2) + D·T3(w1w2)/c2(w1w2) · P2(w3|w2)
    *   P2(w3|w2)   = max(cc−D,0)/cc2(w2) + D·T2(w2)/cc2(w2) · P1(w3)
    *   P1(w3)      = max(n1p(w3)−D,0)/B + D·U/B · 1/V̂
    * with c3/c2 raw tri/bigram counts, T3 = distinct continuations of
    * (w1,w2); cc = |{w1 : (w1,w2,w3) seen}| (continuation count),
    * cc2(w2) = Σ_w3 cc, T2 = distinct w3 with cc>0; n1p(w3) =
    * |{v : (v,w3) seen}|, B = total bigram TYPES, U = words with
    * n1p>0. Unseen (w1,w2) context ⇒ P3 = P2; unseen w2 mid-context ⇒
    * P2 = P1. D = 0.75 (the classic fixed discount — exactly
    * representable, so both engines compute identical doubles).
    *
    * The model IS a set of DataFrames (same persist/version/reuse story
    * as the bigram tables); training is five counting aggregates, all
    * map-side-combined, all vocabulary-shaped. */
  final case class KnModel(tri: DataFrame, bi: DataFrame, cont: DataFrame,
                           contAgg: DataFrame, uniCont: DataFrame,
                           consts: DataFrame)

  def trainKneserNey(train: DataFrame, textCol: String): KnModel = {
    val toks = TextAnalysis.tokens(col(s"`$textCol`"))
    val base = train.select(toks.as("t"))
    val triPos = base.where(size(col("t")) >= 3)
      .select(explode(zip_with(
        zip_with(
          slice(col("t"), lit(1), size(col("t")) - 2),
          slice(col("t"), lit(2), size(col("t")) - 2),
          (a, b) => concat(a, lit(" "), b)),
        slice(col("t"), lit(3), size(col("t")) - 2),
        (ctx, w) => struct(ctx.as("ctx"), w.as("w3")))).as("p"))
      .select(col("p.ctx").as("ctx"), col("p.w3").as("w3"))
    val tri = triPos.groupBy("ctx", "w3").agg(count(lit(1)).as("c3"))
    // raw bigram counts + distinct-continuation counts of each context
    val bi = tri.groupBy("ctx").agg(sum(col("c3")).as("c2"),
      count(lit(1)).as("t3"))
    // continuation layer: how many distinct LEFT words precede (w2, w3)
    val cont = tri
      .select(split(col("ctx"), " ", 2).getItem(1).as("w2"), col("w3"))
      .groupBy("w2", "w3").agg(count(lit(1)).as("cc"))
    val contAgg = cont.groupBy("w2").agg(sum(col("cc")).as("cc2"),
      count(lit(1)).as("t2"))
    // unigram continuation: distinct left contexts of each word, over
    // BIGRAM types (the standard KN unigram estimate)
    val biTypes = base.where(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2")).distinct()
    val uniCont = biTypes.groupBy(col("w2").as("w")).agg(count(lit(1)).as("n1p"))
    val vocab = base.select(explode(col("t")).as("w")).agg(
      countDistinct(col("w")).cast("double").as("vhat0"))
    val consts = uniCont.agg(sum(col("n1p")).cast("double").as("btypes"),
        count(lit(1)).cast("double").as("u"))
      .crossJoin(vocab)
      .select(col("btypes"), col("u"), (col("vhat0") + 1.0).as("vhat"))
    KnModel(tri, bi, cont, contAgg, uniCont, consts)
  }

  /** Score each document's trigram positions under the model:
    * (doc_id, n_trigrams, avg_logp_x1e4) on the shared 1e4 grid; <3
    * tokens ⇒ (0, 0). Scoring is five equi-joins per trigram position
    * against the model tables (vocabulary-sized; the constants travel
    * as a 1-row broadcast) — the [[scoreBigrams]] shape one order up. */
  def scoreKneserNey(docs: DataFrame, idCol: String, textCol: String,
                     model: KnModel, d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, "KN discount needs 0 < D < 1")
    val toks = TextAnalysis.tokens(col(s"`$textCol`"))
    val exploded = docs
      .select(col(s"`$idCol`").cast("long").as("doc_id"), toks.as("t"))
      .where(size(col("t")) >= 3)
      .select(col("doc_id"), explode(zip_with(
        zip_with(
          slice(col("t"), lit(1), size(col("t")) - 2),
          slice(col("t"), lit(2), size(col("t")) - 2),
          (a, b) => concat(a, lit(" "), b)),
        slice(col("t"), lit(3), size(col("t")) - 2),
        (ctx, w) => struct(ctx.as("ctx"), w.as("w3")))).as("p"))
      .select(col("doc_id"), col("p.ctx").as("ctx"), col("p.w3").as("w3"))
      .withColumn("w2", split(col("ctx"), " ", 2).getItem(1))
    val joined = exploded
      .join(model.tri.withColumnRenamed("ctx", "tctx")
        .withColumnRenamed("w3", "tw3"),
        col("ctx") === col("tctx") && col("w3") === col("tw3"), "left")
      .join(model.bi.withColumnRenamed("ctx", "bctx"),
        col("ctx") === col("bctx"), "left")
      .join(model.cont.withColumnRenamed("w2", "cw2")
        .withColumnRenamed("w3", "cw3"),
        col("w2") === col("cw2") && col("w3") === col("cw3"), "left")
      .join(model.contAgg.withColumnRenamed("w2", "aw2"),
        col("w2") === col("aw2"), "left")
      .join(model.uniCont.withColumnRenamed("w", "uw"),
        col("w3") === col("uw"), "left")
      .crossJoin(broadcast(model.consts))
    val p1 = greatest(coalesce(col("n1p"), lit(0L)).cast("double") - d, lit(0.0)) /
      col("btypes") + lit(d) * col("u") / col("btypes") / col("vhat")
    val p2 = when(col("cc2").isNull, p1).otherwise(
      greatest(coalesce(col("cc"), lit(0L)).cast("double") - d, lit(0.0)) /
        col("cc2").cast("double") +
        lit(d) * col("t2").cast("double") / col("cc2").cast("double") * p1)
    val p3 = when(col("c2").isNull, p2).otherwise(
      greatest(coalesce(col("c3"), lit(0L)).cast("double") - d, lit(0.0)) /
        col("c2").cast("double") +
        lit(d) * col("t3").cast("double") / col("c2").cast("double") * p2)
    val scored = joined
      .select(col("doc_id"), log(p3).as("logp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        floor(avg(col("logp")) * 10000 + lit(1e-6)).cast("long").as("avg_logp_x1e4"))
    val all = docs.select(col(s"`$idCol`").cast("long").as("doc_id"))
    all.join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("avg_logp_x1e4"), lit(0L)).as("avg_logp_x1e4"))
  }

  /** Score each document of `docs` under the counts: (idCol, n_bigrams,
    * avg_logp_x1e4). OOV unigrams contribute c1=0 (pure smoothing mass). */
  def scoreBigrams(docs: DataFrame, idCol: String, textCol: String,
                   bigramCounts: DataFrame, unigramCounts: DataFrame,
                   k: Double = 0.5): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    val toks = TextAnalysis.tokens(col(s"`$textCol`"))
    val vocab = unigramCounts.agg(count(lit(1)).cast("double").as("v"))
    val exploded = docs
      .select(col(s"`$idCol`").cast("long").as("doc_id"), toks.as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("w1"), concat(a, lit(" "), b).as("bg")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.bg").as("bg"))
    val scored = exploded
      .join(bigramCounts, exploded("bg") === bigramCounts("bg"), "left")
      .join(unigramCounts, exploded("w1") === unigramCounts("w"), "left")
      .crossJoin(broadcast(vocab)) // 1-row constants
      .select(col("doc_id"),
        (log((coalesce(col("c2"), lit(0L)).cast("double") + lit(k)) /
          (coalesce(col("c1"), lit(0L)).cast("double") + lit(k) * col("v")))).as("logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        floor(avg(col("logp")) * 10000 + lit(1e-6)).cast("long").as("avg_logp_x1e4"))
    // docs with <2 tokens: n_bigrams=0, score 0 (kept, flagged)
    val all = docs.select(col(s"`$idCol`").cast("long").as("doc_id"))
    all.join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_logp_x1e4"), lit(0L)).as("avg_logp_x1e4"))
  }
}
