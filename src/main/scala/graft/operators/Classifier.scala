package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-token multinomial Naive Bayes — the quality/language classifier
  * of a training-data curation stack (the CCNet/fastText recipe: a linear
  * model over hashed token counts is how corpus-scale filtering is
  * actually done — McCallum & Nigam 1998 for the multinomial NB model,
  * Weinberger et al. 2009 for the hashing trick), built entirely as
  * counting aggregates so BOTH training and inference are one-pass,
  * map-side-combined, and exactly replayable by the oracle.
  *
  * Why NB and not gradient descent at 100 TB: training IS one groupBy —
  * (label, bucket) occurrence counts; no epochs, no driver-resident
  * weight vector being iterated against the cluster, no learning-rate
  * schedule to tune. The model is `labels × nBuckets` counts — KB-sized,
  * broadcast to inference, mergeable across corpus shards by plain
  * addition (counts are additive), which gives the store/incremental
  * law for free: day-0 counts + day-1 counts == whole-corpus counts,
  * row-for-row.
  *
  * Determinism/portability: token buckets come from the engine's md5
  * hex-slice hash ([[graft.operators.Sketches]] discipline — never an
  * engine-private hash); all counts are exact longs; per-(doc, label)
  * scores are sums of `ln` of exact-integer rationals (Laplace-smoothed
  * likelihoods plus the label's log-prior), floored onto the x1e4 grid
  * with the 1e-6 nudge ([[graft.operators.Ranking]]'s cross-engine grid
  * argument). The argmax is taken over the FLOORED integer scores with a
  * label tie-break, so a prediction can only differ across engines if a
  * true score sits on a grid boundary — which the nudge excludes.
  *
  * Scale shape of inference: docs explode to (doc, bucket, tfb) — one
  * narrow pass plus one (doc, bucket) combine bounded by
  * min(tokens, nBuckets) per doc; the dense per-(bucket, label)
  * log-likelihood table (nBuckets × L rows) broadcasts; the final
  * (doc, label) sum combines map-side into L rows per doc. The corpus
  * text never shuffles; nothing global sorts.
  */
object Classifier {

  /** Portable token bucket: first 3 md5 hex chars (12 bits) mod nBuckets;
    * nBuckets must divide 4096 (uniform reduction, CMS-width rule). */
  def tokenBucket(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok), 1, 3), 16, 10).cast("long") % nBuckets

  private def requireBuckets(nBuckets: Int): Unit =
    require(nBuckets >= 2 && 4096 % nBuckets == 0,
      s"nBuckets must divide 4096 for a uniform 12-bit reduction, got $nBuckets")

  /** Train: sparse (label, bucket, cnt) token-occurrence counts plus
    * (label, n_docs) document counts — the ENTIRE model state, additive
    * across shards/days (merge == retrain by construction). One corpus
    * scan, one bounded aggregate (≤ labels × nBuckets rows). */
  def trainNb(docs: DataFrame, textCol: String, labelCol: String,
              nBuckets: Int = 1024): (DataFrame, DataFrame) = {
    requireBuckets(nBuckets)
    val base = docs.where(col(s"`$textCol`").isNotNull && col(s"`$labelCol`").isNotNull)
    val counts = base
      .select(col(s"`$labelCol`").as("label"),
        explode(TextAnalysis.tokens(col(s"`$textCol`"))).as("tok"))
      .groupBy(col("label"), tokenBucket(col("tok"), nBuckets).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val docCounts = base.groupBy(col(s"`$labelCol`").as("label"))
      .agg(count(lit(1)).as("n_docs"))
    (counts, docCounts)
  }

  /** Per-(doc, label) scores on the x1e4 grid:
    * `floor((ln(prior) + Σ_tokens tfb · ln((cnt+1)/(tot_label+nBuckets)))
    * · 1e4 + 1e-6)`. `counts`/`docCounts` are [[trainNb]] output (or the
    * sum of several days' outputs — the model is additive). Buckets the
    * label never saw contribute the smoothed floor ln(1/(tot+B)); the
    * dense (bucket, label) table is built here so the join is
    * broadcast-sized regardless of corpus size. */
  def scoreNb(docs: DataFrame, idCol: String, textCol: String,
              counts: DataFrame, docCounts: DataFrame,
              nBuckets: Int = 1024): DataFrame = {
    requireBuckets(nBuckets)
    val spark = docs.sparkSession
    // label totals: token mass and doc priors — L rows
    val totals = counts.groupBy(col("label")).agg(sum(col("cnt")).as("tot"))
      .join(docCounts, "label")
    val allDocs = docCounts.agg(sum(col("n_docs")).as("n_all"))
    // dense (bucket, label) log-likelihood table: nBuckets × L rows
    val dense = spark.range(nBuckets).select(col("id").as("bucket"))
      .crossJoin(totals)
      .join(counts, Seq("bucket", "label"), "left_outer")
      .select(col("bucket"), col("label"),
        log((coalesce(col("cnt"), lit(0L)).cast("double") + 1.0) /
          (col("tot").cast("double") + nBuckets.toDouble)).as("lnp"))
    val priors = totals.crossJoin(allDocs)
      .select(col("label"),
        (log(col("n_docs").cast("double")) - log(col("n_all").cast("double"))).as("lnprior"))
    val tfb = docs.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("doc_id"),
        explode(TextAnalysis.tokens(col(s"`$textCol`"))).as("tok"))
      .groupBy(col("doc_id"), tokenBucket(col("tok"), nBuckets).as("bucket"))
      .agg(count(lit(1)).as("tfb"))
    tfb.join(broadcast(dense), "bucket")
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("tfb").cast("double") * col("lnp")).as("lnlik"))
      .join(broadcast(priors), "label")
      .select(col("doc_id"), col("label"),
        floor((col("lnprior") + col("lnlik")) * 10000 + lit(1e-6))
          .cast("long").as("score_x1e4"))
  }

  /** Collected dense model for IN-ROW scoring: label-sorted
    * (label, lnprior, lnp-per-bucket) with the same arithmetic as
    * [[scoreNb]]'s dense table (JVM `Math.log` both ways). KB-sized —
    * labels × nBuckets doubles — destined to ride the plan as literals
    * (the centroid/projection-literal discipline), which is what makes
    * scoring a pure per-row expression: no shuffle, no state, and
    * therefore streamable in append mode with zero state store. */
  def collectModel(counts: DataFrame, docCounts: DataFrame,
                   nBuckets: Int = 1024): Seq[(String, Double, Array[Double])] = {
    requireBuckets(nBuckets)
    val dcs = docCounts.collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    require(dcs.nonEmpty, "collectModel: empty model (no training docs)")
    val nAll = dcs.values.sum
    val tots = counts.groupBy(col("label")).agg(sum(col("cnt")).as("tot")).collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val cnts = counts.collect()
      .map(r => (String.valueOf(r.get(0)), r.getLong(1)) -> r.getLong(2)).toMap
    dcs.keys.toSeq.sorted.map { label =>
      val tot = tots.getOrElse(label, 0L)
      val lnprior = math.log(dcs(label).toDouble) - math.log(nAll.toDouble)
      val lnp = Array.tabulate(nBuckets) { b =>
        math.log((cnts.getOrElse((label, b.toLong), 0L).toDouble + 1.0) /
          (tot.toDouble + nBuckets.toDouble))
      }
      (label, lnprior, lnp)
    }
  }

  /** In-row prediction: per-label scores as one codegen'd `aggregate`
    * over the SORTED bucket-id array against the literal lnp tables,
    * floored onto the x1e4 grid, argmax by first-position-of-max
    * (= label ascending tie-break, [[predictNb]]'s rule). Output
    * (doc_id, pred, score_x1e4) — agrees with trainNb→scoreNb→predictNb
    * row-for-row (ClassifierSpec law), and because no shuffle or state
    * is involved it runs verbatim on a STREAMING frame in append mode.
    *
    * Arithmetic association (advisor r15 #3): the per-label sum is a
    * run-length pass over the sorted bucket ids, emitting ONE
    * `tfb · lnp[b]` product per distinct bucket — the SAME multiset of
    * double terms [[scoreNb]] sums (which the old token-order
    * `lnp+lnp+…` accumulation did not produce: repeated addition and
    * one multiplication differ in IEEE arithmetic, so a doc with a
    * repeated token could land ulps away from the batch score and flip
    * a floor(x·1e4) boundary). Residual risk, documented: the batch
    * path sums those terms in shuffle order while this path sums them
    * bucket-ascending — identical-multiset reassociation can still
    * differ by final-ulp amounts; the 1e-6 nudge absorbs everything
    * except a true value within ~1e-6·1e-4 of a grid boundary. */
  def predictNbInRow(docs: DataFrame, idCol: String, textCol: String,
                     model: Seq[(String, Double, Array[Double])],
                     nBuckets: Int = 1024,
                     keep: Seq[String] = Nil): DataFrame = {
    requireBuckets(nBuckets)
    require(model.nonEmpty, "predictNbInRow: empty model")
    require(model.forall(_._3.length == nBuckets),
      s"predictNbInRow: model bucket arrays must have length $nBuckets")
    val toks = TextAnalysis.tokens(col(s"`$textCol`"))
    def scoreOf(lnprior: Double, lnp: Array[Double]): Column = {
      val lnpLit = typedLit(lnp.toSeq)
      def term(b: Column, c: Column): Column =
        when(c === 0L, lit(0.0))
          .otherwise(c.cast("double") * element_at(lnpLit, (b + 1L).cast("int")))
      val fin = aggregate(
        col("__bks"),
        struct(lit(-1L).as("b"), lit(0L).as("c"), lit(0.0).as("s")),
        (acc, b) => when(b === acc.getField("b"),
            struct(acc.getField("b").as("b"),
              (acc.getField("c") + 1L).as("c"), acc.getField("s").as("s")))
          .otherwise(struct(b.as("b"), lit(1L).as("c"),
            (acc.getField("s") + term(acc.getField("b"), acc.getField("c"))).as("s"))),
        acc => acc.getField("s") + term(acc.getField("b"), acc.getField("c")))
      floor((lit(lnprior) + fin) * 10000 + lit(1e-6)).cast("long")
    }
    val scores = array(model.map { case (_, p, l) => scoreOf(p, l) }: _*)
    val labels = typedLit(model.map(_._1))
    val kept = keep.map(c => col(s"`$c`"))
    docs.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("doc_id") +:
        array_sort(transform(toks, t => tokenBucket(t, nBuckets))).as("__bks") +: kept: _*)
      .select(col("doc_id") +: scores.as("__s") +: kept: _*)
      .select(col("doc_id") +:
        element_at(labels, array_position(col("__s"), array_max(col("__s"))).cast("int")).as("pred") +:
        array_max(col("__s")).as("score_x1e4") +: kept: _*)
  }

  /** Argmax prediction per document over the FLOORED scores, label
    * tie-break ascending — deterministic cross-engine. */
  def predictNb(scores: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_x1e4").desc, col("label"))
    scores.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred"), col("score_x1e4"))
  }
}
