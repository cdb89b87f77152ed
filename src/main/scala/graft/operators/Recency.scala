package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recency-weighted aggregation with EXACT arithmetic — the freshness
  * signal a training-data pipeline uses to up-weight recent interactions
  * (sampling weights, feature decay, trending detection). A true
  * exponential `exp(-age/τ)` is float-order-dependent and never
  * engine-exact; this operator instead quantizes age into
  * `halfLifeDays`-wide buckets and assigns weight `2^(maxShift − bucket)`
  * — a faithful half-life decay (weight exactly halves every bucket) in
  * pure Long arithmetic, so the decayed sums are bit-identical across
  * engines, partitionings, and reduction orders, and the oracle replays
  * them in SQL.
  *
  * Ages are measured against a caller-supplied `refEpochSec` (never
  * `now()` — a reproducible pipeline pins its reference instant), with
  * floor-second timestamp truncation on both engines. Events older than
  * `maxShift` buckets get weight 0 (fully decayed) rather than
  * underflowing; events after the reference are rejected by requiring a
  * non-negative age (a negative shift would silently overflow).
  *
  * Scale shape: one narrow projection (age, bucket, weight are all
  * per-row integer expressions) and ONE map-side-combined groupBy on the
  * key — the same cost as any keyed sum, at any corpus size. */
object Recency {

  /** Per-key decayed sums: (key, n_events, w_sum, decayed_cents) where
    * `decayed_cents = Σ round(value·100) · 2^(maxShift − age/halfLife)`.
    * NULL keys, timestamps, or values are dropped. */
  def halfLifeWeightedSum(events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
                          refEpochSec: Long, halfLifeDays: Int, maxShift: Int = 30): DataFrame = {
    require(halfLifeDays >= 1, "halfLifeDays must be >= 1")
    require(maxShift >= 1 && maxShift <= 62, "maxShift in [1, 62] — it is a Long shift")
    val key = col(s"`$keyCol`")
    val ts = col(s"`$tsCol`")
    val v = col(s"`$valueCol`")
    // the guard is on the RAW seconds age: `div 86400` truncates toward
    // zero, so a day-quantized `ageDays < 0` check would wave through an
    // event up to 86399 s after the reference with full weight (and the
    // oracle's floor division would bucket it at -1 — a guaranteed
    // mismatch); sub-day-future events must be rejected like any other
    val ageSec = expr(s"$refEpochSec - CAST(CAST(`$tsCol` AS TIMESTAMP) AS LONG)")
    val bucket = expr(s"(($refEpochSec - CAST(CAST(`$tsCol` AS TIMESTAMP) AS LONG)) div 86400) div $halfLifeDays")
    events
      .where(key.isNotNull && ts.isNotNull && v.isNotNull)
      .select(key.as("key"),
        round(v * 100, 0).cast("long").as("__cents"),
        when(ageSec < 0, raise_error(lit(
          s"halfLifeWeightedSum: event after refEpochSec=$refEpochSec — pin the reference " +
            "instant AFTER the newest event")).cast("long"))
          .when(bucket <= maxShift,
            expr(s"shiftleft(CAST(1 AS BIGINT), CAST($maxShift - " +
              s"((($refEpochSec - CAST(CAST(`$tsCol` AS TIMESTAMP) AS LONG)) div 86400) div $halfLifeDays) AS INT))"))
          .otherwise(lit(0L)).as("__w"))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("__w")).as("w_sum"),
        sum(col("__cents") * col("__w")).as("decayed_cents"))
  }
}
