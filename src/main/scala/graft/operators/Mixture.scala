package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-balanced multilingual mixture (the mT5 / NLLB recipe:
  * sample language l with probability ∝ n_l^τ, τ < 1, so head languages
  * are down-weighted and tail languages up-weighted) — the step between
  * language identification and corpus assembly in a multilingual
  * training-data pipeline.
  *
  * τ is fixed at 1/2 and computed as an EXACT integer square root
  * (float `sqrt` drifts at perfect-square boundaries across engines; the
  * ±1 correction below makes `isqrt` a pure integer function, so quota
  * arithmetic — and therefore the sampled corpus — is bit-identical and
  * the oracle replays it in SQL). Generalizing τ to other rationals
  * would need integer k-th roots; 1/2 is the published default and the
  * only value this operator ships.
  *
  * Scale shape: quotas are one map-side-combined count per language
  * (|langs| rows — model-sized, broadcast everywhere downstream). The
  * sample itself never sorts the corpus: ranks come from the bounded-heap
  * top-k aggregate (≤ budget rows per language per map partition move),
  * and membership is decided by a broadcast quota join. Cost is one
  * combined shuffle of heap summaries — linear in corpus size with a
  * budget-bounded constant. */
object Mixture {

  /** Exact integer square root: floor(sqrt(n)) for n >= 0, with a ±1
    * correction absorbing float-sqrt boundary drift. */
  def isqrt(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    val down = when(s0 * s0 > n, s0 - 1).otherwise(s0)
    when((down + 1) * (down + 1) <= n, down + 1).otherwise(down)
  }

  /** Per-language temperature quotas for a total `budget` of documents:
    * (lang, n_docs, w, quota) with w = isqrt(n_docs) and quota =
    * floor(budget * w / Σw). Floor leaves a deficit of at most
    * |langs|-1 documents — deliberate: a largest-remainder top-up would
    * make one language's quota depend on every other's fraction, and
    * reproducible arithmetic beats hitting the budget exactly. NULL
    * languages are dropped (no quota without an identity). */
  def temperatureQuotas(df: DataFrame, langCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val counts = df.where(col(s"`$langCol`").isNotNull)
      .groupBy(col(s"`$langCol`").as("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", isqrt(col("n_docs")))
    val total = counts.agg(sum(col("w")).as("w_total"))
    counts.crossJoin(broadcast(total))
      .select(col("lang"), col("n_docs"), col("w"),
        expr(s"($budget * w) div w_total").as("quota"))
  }

  /** The temperature-balanced sample itself: within each language, rank
    * documents by the portable ring hash (ties by id) and keep the first
    * `quota`. Returns (lang, doc_id, rank); rank is 1-based within the
    * language. The per-language ranking runs through the bounded-heap
    * aggregate with k = budget (a quota can never exceed the budget), so
    * no per-language sort and at most `budget` rows per language per map
    * partition ever shuffle. */
  def temperatureSample(df: DataFrame, idCol: String, langCol: String,
                        budget: Long): DataFrame = {
    require(budget > 0 && budget <= 1000000, "budget must be in (0, 1e6] — it bounds the per-group heap")
    val quotas = temperatureQuotas(df, langCol, budget)
      .select(col("lang"), col("quota"))
    val id = col(s"`$idCol`").cast("long")
    val ranked = df
      .where(id.isNotNull && col(s"`$langCol`").isNotNull)
      .groupBy(col(s"`$langCol`").as("lang"))
      // highest score wins, ties to lowest id — negate the 32-bit ring
      // hash (exactly representable as a double, same idiom as Caps)
      .agg(graft.plans.TopKAggregate.topKByScore(
        -Sampling.idHash(id).cast("double"), id, budget.toInt).as("__top"))
      .select(col("lang"), posexplode(col("__top.id")).as(Seq("pos", "doc_id")))
    ranked.join(broadcast(quotas), Seq("lang"))
      .where(col("pos") < col("quota"))
      .select(col("lang"), col("doc_id"), (col("pos") + 1).cast("long").as("rank"))
  }
}
