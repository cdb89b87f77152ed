package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One shared time-unit policy for every operator that takes a `tsCol`.
  *
  * Round 9 broke `gapfill_resample` when the testdata's `events.ts` moved
  * from epoch-nanos long to `timestamp[us]` and exactly one operator
  * (Resample) still assumed the old dtype. The fix is structural, not
  * local: all tsCol-taking operators (Funnel, Cohorts, Resample) resolve
  * the column through this helper, so a future schema change breaks ZERO
  * or ALL of them — never silently one.
  *
  * Contract: integral columns pass through untouched (the caller owns the
  * unit — nanos, micros, anything monotone); `timestamp` /
  * `timestamp_ntz` convert EXACTLY to epoch microseconds via
  * `unix_micros` (parquet stores micros, so no precision is invented or
  * lost). NTZ → LTZ conversion is exact only under a pinned UTC session
  * timezone, which Bench/Verify both set.
  */
object TimeCols {

  /** Epoch-micros (or caller-unit integral passthrough) projection of a
    * time column, plus the per-second scale of the resulting unit (None
    * for integral passthrough — the caller's unit is opaque). */
  def epochMicrosWithScale(df: DataFrame, tsCol: String): (Column, Option[Long]) = {
    val c = col(s"`$tsCol`")
    df.schema(tsCol).dataType match {
      case TimestampType    => (unix_micros(c), Some(1000000L))
      case TimestampNTZType => (unix_micros(c.cast(TimestampType)), Some(1000000L))
      case ByteType | ShortType | IntegerType | LongType => (c.cast("long"), None)
      case dt => throw new IllegalArgumentException(
        s"time column `$tsCol` must be integral or timestamp, got $dt")
    }
  }

  /** Epoch-micros projection (integral columns pass through as long). */
  def epochMicros(df: DataFrame, tsCol: String): Column =
    epochMicrosWithScale(df, tsCol)._1

  /** True FLOOR division of an (already-projected, long) epoch column into
    * `step`-sized buckets. Spark's `div` truncates toward zero, which
    * would put a pre-epoch timestamp (negative epoch) in the wrong bucket
    * and diverge from the floor semantics a SQL oracle's `//` uses.
    * Integer arithmetic throughout — double division would silently lose
    * precision past 2^53 (any epoch-nanos value), so this takes a column
    * NAME and builds `div` on it rather than `Column./`. */
  def floorBucketOf(colName: String, step: Long): Column =
    expr(s"`$colName` div ${step}L") +
      when(col(s"`$colName`") % step < 0, lit(-1L)).otherwise(lit(0L))
}
