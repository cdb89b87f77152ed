package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the dbt-test /
  * Great-Expectations surface a curation pipeline gates loads on:
  * "this column is never null", "ids are unique", "values sit in
  * [lo, hi]", "row count is in range".
  *
  * Scale shape: every check compiles to an aggregate over ONE shared
  * full-table pass (a single `agg` with map-side partials — no per-check
  * scans, no shuffle beyond the 1-row combine), except `unique`, which
  * needs a distinct count and piggybacks the same pass via
  * `count_distinct`. Results come back as one row per check
  * `(check, column, observed, expected_lo, expected_hi, pass)` — integer
  * observables only, so any engine replays the report bit-for-bit.
  */
object Checks {

  sealed trait Check {
    private[operators] def name: String
    private[operators] def column: String
    /** The observed integer metric. */
    private[operators] def observe: Column
    /** Inclusive pass bounds on the observed metric. */
    private[operators] def lo: Long
    private[operators] def hi: Long
  }

  /** No null values in `col`: observed = null count, pass iff 0. */
  case class NotNull(column: String) extends Check {
    private[operators] def name = "not_null"
    private[operators] def observe = count(when(col(s"`$column`").isNull, 1))
    private[operators] def lo = 0L; private[operators] def hi = 0L
  }

  /** All values distinct (nulls ignored, SQL-distinct semantics):
    * observed = non-null count minus distinct count, pass iff 0. */
  case class Unique(column: String) extends Check {
    private[operators] def name = "unique"
    private[operators] def observe =
      count(col(s"`$column`")) - count_distinct(col(s"`$column`"))
    private[operators] def lo = 0L; private[operators] def hi = 0L
  }

  /** Every non-null value inside [min, max]: observed = out-of-bounds
    * count, pass iff 0. The bounds are Longs — cast the column upstream
    * for decimals (integer observables keep the report engine-portable). */
  case class InRange(column: String, min: Long, max: Long) extends Check {
    private[operators] def name = "in_range"
    private[operators] def observe = count(when(
      col(s"`$column`").isNotNull &&
        (col(s"`$column`") < min || col(s"`$column`") > max), 1))
    private[operators] def lo = 0L; private[operators] def hi = 0L
  }

  /** Every non-null value in the accepted set: observed = rejected count. */
  case class AcceptedValues(column: String, values: Seq[String]) extends Check {
    private[operators] def name = "accepted_values"
    private[operators] def observe = count(when(
      col(s"`$column`").isNotNull &&
        !col(s"`$column`").cast("string").isin(values: _*), 1))
    private[operators] def lo = 0L; private[operators] def hi = 0L
  }

  /** Total row count within [minRows, maxRows]. */
  case class RowCount(minRows: Long, maxRows: Long) extends Check {
    private[operators] def name = "row_count"
    private[operators] def column = "*"
    private[operators] def observe = count(lit(1))
    private[operators] def lo = minRows; private[operators] def hi = maxRows
  }

  /** Run all checks in one aggregate pass; one result row per check. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.observe.cast("long").as(s"__m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), lit(c.column).as("column"),
        col(s"__m$i").as("observed"),
        lit(c.lo).as("expected_lo"), lit(c.hi).as("expected_hi"),
        (col(s"__m$i") >= c.lo && col(s"__m$i") <= c.hi).cast("long").as("pass"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** True iff every check passes (driver-side convenience for gating a
    * load — one small collect of |checks| rows). */
  def allPass(df: DataFrame, checks: Seq[Check]): Boolean =
    run(df, checks).agg(min(col("pass"))).head().getLong(0) == 1L
}
