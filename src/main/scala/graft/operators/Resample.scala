package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: bucket an event stream onto a fixed grid,
  * materialize the missing buckets per key, and forward-fill values — the
  * "resample + ffill" every telemetry/feature pipeline needs before
  * windowed training.
  *
  * Scale shape: one aggregating shuffle on (key, bucket), a per-key spine
  * generated from a tiny (key, lo, hi) aggregate via `sequence`/`explode`
  * (narrow), a (key, bucket) join, and a per-key ordered window for the
  * fill. Everything hashes on the key, so AQE coalesces the three
  * exchanges into the same partitioning family; per-key state is bounded
  * by the key's own time range, never by corpus size. Bucketing is exact
  * integer floor-division on the epoch — no float time math — so any
  * engine reproduces bucket identity bit-for-bit.
  *
  * Keys whose range would explode the grid (`hi - lo > maxBuckets`) fail
  * loudly rather than silently OOM-ing an executor with a billion-element
  * `sequence` — a data-quality guard, not a tuning knob.
  */
object Resample {

  /** `df` with columns key:long, bucket:long, value:(observed or null),
    * filled:(forward-filled).
    *
    * `tsCol` may be `timestamp` / `timestamp_ntz` (converted exactly to
    * epoch MICROSECONDS via [[TimeCols.epochMicros]] — the testdata's
    * `events.ts` dtype since round 9) or an integral column, which is
    * treated as the legacy epoch-NANOSECONDS contract every pre-r9 caller
    * and spec used. Bucket identity is identical either way: floor
    * division of the epoch by `bucketSeconds` in the column's unit. */
  def gapFillForward(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
                     bucketSeconds: Long, maxBuckets: Long = 1000000L): DataFrame = {
    val key = col(s"`$keyCol`")
    val (tsEpoch, scale) = TimeCols.epochMicrosWithScale(df, tsCol)
    val step = bucketSeconds * scale.getOrElse(1000000000L)

    val perBucket = df
      .select(key.as("key"), tsEpoch.as("__ts"), col(s"`$valueCol`").as("v"))
      .select(col("key"), TimeCols.floorBucketOf("__ts", step).as("bucket"), col("v"))
      .groupBy(col("key"), col("bucket"))
      // max: deterministic under any row order (unlike first/last/avg)
      .agg(max(col("v")).as("v"))

    val ranges = perBucket.groupBy(col("key"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    // the guard lives inside the sequence bound so column pruning can't
    // drop it: an oversized range fails the job before the explode runs
    val hiGuarded = when(col("hi") - col("lo") >= maxBuckets,
      raise_error(concat(lit(s"gap-fill grid over $maxBuckets buckets for key "),
        col("key").cast("string"))).cast("long")).otherwise(col("hi"))
    val spine = ranges
      .select(col("key"), explode(sequence(col("lo"), hiGuarded)).as("bucket"))

    val filled = spine.join(perBucket, Seq("key", "bucket"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true)
        .over(Window.partitionBy(col("key")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    filled.select(col("key"), col("bucket"), col("v").as("value"), col("filled"))
  }

  /** Integer checksum of a filled double on the cent grid: observed values
    * are 2-decimal, so x*100 lands within float-noise of an integer and
    * `round` can never sit on a .5 boundary. */
  def centChecksum(c: Column): Column = round(c * 100, 0).cast("long")
}
