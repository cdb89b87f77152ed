package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group row caps — the "at most K documents per domain" rule every
  * web-scale curation pipeline applies before mixing (a handful of hub
  * domains otherwise contribute an unbounded share of the corpus).
  *
  * Selection must be DETERMINISTIC and order-free: the kept set for a
  * domain may not depend on partitioning, arrival order, or engine — so
  * the selector is the engine-portable Knuth hash of the row id
  * ([[Sampling.idHash]]): a group keeps its K rows with the smallest
  * (hash, id). That is a uniform random-looking K-subset, reproducible
  * bit-for-bit by any engine that can multiply integers, and nested caps
  * agree (the K=10 winners are a subset of the K=50 winners — useful when
  * re-capping an already-capped corpus tighter).
  *
  * Scale shape: ONE hash shuffle on the group key into the bounded-heap
  * aggregate [[graft.plans.TopKAggregate]] — each map task reduces its
  * slice of a group to ≤K candidates before the exchange, so the shuffle
  * carries O(groups × K) rows no matter how hot the hottest domain is.
  * Never a per-group window sort: `row_number()` over a billion-row domain
  * sorts that domain's entire partition on one task; the heap holds K
  * entries and streams. The kept-id set (≤ groups × K) then broadcast
  * semi-joins back onto the table to recover full rows.
  */
object Caps {

  /** Ids kept by a cap of `k` rows per group: (groupCols..., id). The id
    * column must be integral, non-negative, and UNIQUE WITHIN its group —
    * it is the selection identity, and a group with duplicate id rows can
    * exceed its cap through the join-back. This is a WEAKER contract than
    * [[Versioning.latestKPerKey]]: that operator joins back on the bare id
    * and therefore needs GLOBALLY unique ids, while [[capPerGroup]] joins
    * on (group key, id), so per-group id sequences duplicated across
    * groups are fine here. NULL ids or group keys are dropped
    * (a row with no identity cannot be deterministically capped). */
  def cappedIds(df: DataFrame, groupCols: Seq[String], idCol: String, k: Int): DataFrame = {
    require(k >= 1, "cap must be >= 1")
    val id = col(s"`$idCol`").cast("long")
    val groups = groupCols.map(c => col(s"`$c`"))
    // score: heap keeps highest score, ties to LOWEST id — so feed the
    // negated hash; 32-bit hashes are exactly representable as doubles
    val keep = df
      .where(id.isNotNull && groups.map(_.isNotNull).reduce(_ && _))
      .groupBy(groups: _*)
      .agg(graft.plans.TopKAggregate.topKByScore(
        -Sampling.idHash(id).cast("double"), id, k).as("__top"))
      .select(groups :+ explode(col("__top.id")).as(idCol): _*)
    keep
  }

  /** `df` with each group capped at `k` rows (deterministic hash-order
    * winners). The winner set is O(groups × k) — broadcast it. The
    * join-back matches on (group key, id) — NOT the id alone — so ids
    * only scoped unique within their group (a per-domain sequence) still
    * cap correctly, and an id duplicated across groups cannot smuggle
    * extra rows past another group's cap. */
  /** TOKEN-budget cap per group — the cap a training-data mixer actually
    * enforces (a source's contribution is priced in tokens, not
    * documents): greedy deterministic fill in (idHash, id) order until
    * the group's cumulative token count reaches `budget`. The document
    * that STRADDLES the budget is kept (the budget is a floor on
    * progress, not a hard ceiling — dropping the straddler could leave a
    * group of one long doc empty), so the kept set is the shortest
    * hash-order prefix whose token sum meets or exceeds the budget.
    *
    * Scale shape: one per-group exchange + in-partition sort for the
    * running sum — no global sort, no join; selection is stable across
    * runs/engines/partitionings because the order key is the same
    * portable ring hash every sampler here uses. NULL ids, group keys,
    * or token counts are dropped (no identity → no deterministic cap). */
  def capTokensPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                        tokenCol: String, budget: Long): DataFrame = {
    require(budget >= 1, "token budget must be >= 1")
    require(groupCols.nonEmpty, "need at least one group column")
    import org.apache.spark.sql.expressions.Window
    val id = col(s"`$idCol`").cast("long")
    val groups = groupCols.map(c => col(s"`$c`"))
    val w = Window.partitionBy(groups: _*)
      .orderBy(Sampling.idHash(id).asc, id.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.where(id.isNotNull && col(s"`$tokenCol`").isNotNull &&
        groups.map(_.isNotNull).reduce(_ && _))
      .withColumn("__cum_before",
        coalesce(sum(col(s"`$tokenCol`").cast("long")).over(w), lit(0L)))
      .where(col("__cum_before") < budget)
      .drop("__cum_before")
  }

  def capPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String, k: Int): DataFrame = {
    val winners = cappedIds(df, groupCols, idCol, k)
    val renamed = winners.columns.foldLeft(winners)((d, c) => d.withColumnRenamed(c, s"__w_$c"))
    val cond = (groupCols :+ idCol).map(c =>
      col(s"`$c`") === col(s"`__w_$c`")).reduce(_ && _)
    df.join(broadcast(renamed), cond, "left_semi")
  }
}
