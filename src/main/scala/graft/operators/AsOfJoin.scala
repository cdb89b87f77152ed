package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-previous) join — the temporal join Spark's batch API
  * lacks (pandas has merge_asof; DuckDB has ASOF JOIN): for every left row,
  * attach the LATEST right row of the same key whose time is <= the left
  * row's time (backward as-of, inclusive), optionally within a tolerance.
  *
  * Implementation is the scalable UNION + WINDOW composition, not a range
  * self-join: tag both sides, union, and take `last(right value) ignoring
  * nulls` over a (key, time)-ordered window bounded to the current row.
  * Cost is ONE shuffle on the key (the window's partitioning) over
  * left+right together — no join explosion, no per-row range probe; skew
  * follows the key distribution exactly like any keyed window. At equal
  * timestamps the right row sorts BEFORE the left row (side ordinal), so a
  * left row matches a right row stamped at the same instant.
  *
  * Contracts: right (key, ts) pairs should be unique (among equal-ts right
  * duplicates the winner is deterministic only up to input order), and
  * `rightCols` names should not collide with left column names (attached
  * under their own names — rename on the right side first if they do). */
object AsOfJoin {

  /** Backward as-of join. `rightCols` are the right-side payload columns to
    * attach (null when no right row is at-or-before the left time, or when
    * the match is older than `toleranceMs`). The matched right time is
    * attached as `__asof_ts`. */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String, leftTs: String,
               rightTs: String, rightCols: Seq[String],
               toleranceMs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftMarked = left.select(
      (leftCols.map(c => col(s"`$c`")) ++
        Seq(lit(1).as("__side"),
          col(s"`$leftTs`").cast("timestamp").as("__t"),
          lit(null).cast("timestamp").as("__rt")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))): _*)
    val rightMarked = right.select(
      (Seq(col(s"`$keyCol`")) ++
        leftCols.filterNot(_ == keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"),
          col(s"`$rightTs`").cast("timestamp").as("__t"),
          col(s"`$rightTs`").cast("timestamp").as("__rt")) ++
        rightCols.map(c => col(s"`$c`").as(s"__r_$c"))): _*)

    // right rows (side 0) sort before left rows (side 1) at equal __t:
    // inclusive backward as-of
    val w = Window.partitionBy(col(s"`$keyCol`")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(
      leftMarked.unionByName(rightMarked)
        .withColumn("__asof_ts", last(col("__rt"), ignoreNulls = true).over(w))) { (df, c) =>
      df.withColumn(s"__f_$c", last(col(s"`__r_$c`"), ignoreNulls = true).over(w))
    }
    val inTolerance = toleranceMs match {
      case Some(ms) => unix_millis(col("__t")) - unix_millis(col("__asof_ts")) <= ms
      case None => col("__asof_ts").isNotNull
    }
    filled.where(col("__side") === 1).select(
      (leftCols.map(c => col(s"`$c`")) ++
        Seq(when(inTolerance, col("__asof_ts")).as("__asof_ts")) ++
        rightCols.map(c => when(inTolerance, col(s"`__f_$c`")).as(c))): _*)
  }
}
