package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis: group users by the period of their first
  * event (the cohort), then count how many of each cohort are active
  * again `offset` periods later — the standard product-analytics
  * retention triangle.
  *
  * Scale shape: ONE shuffle (groupBy user) computes, per user, the cohort
  * period AND the distinct set of active periods together; the per-user
  * period set then explodes (bounded by periods-per-user, ~30 for a
  * month of dailies) and the matrix rollup aggregates (cohort, offset)
  * cells — a second shuffle whose input is (user x active-period) rows,
  * already far smaller than the event table. The naive formulation is a
  * self-join of events against per-user minima; this never joins the
  * event table at all. Integer FLOOR-division period arithmetic
  * ([[TimeCols.floorBucketOf]]) keeps every boundary engine-portable,
  * including pre-epoch timestamps.
  */
object Cohorts {

  /** Retention matrix `(cohort, offset, n_users)`: users whose first-ever
    * event falls in period `cohort` and who have at least one event in
    * period `cohort + offset`. `offset` 0 row = cohort size (every user is
    * active in their first period by definition). `tsCol` resolves
    * through [[TimeCols]]: integral columns keep the caller's unit,
    * timestamp columns become epoch micros; `periodLength` is the period
    * in that resolved unit. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      periodLength: Long): DataFrame = {
    require(periodLength > 0, "periodLength must be positive")
    events
      .select(col(s"`$userCol`").as("__user"),
        TimeCols.epochMicros(events, tsCol).as("__ts"))
      // FLOOR division (TimeCols.floorBucketOf), not truncating `div`: a
      // pre-epoch event would land in the wrong period and diverge from
      // the oracle's `//` — the exact bug class Resample already fixed
      .select(col("__user"), TimeCols.floorBucketOf("__ts", periodLength).as("__p"))
      .groupBy(col("__user"))
      .agg(min(col("__p")).as("cohort"), collect_set(col("__p")).as("ps"))
      .select(col("cohort"), explode(col("ps")).as("p"))
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
