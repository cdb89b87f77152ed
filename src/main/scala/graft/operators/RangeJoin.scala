package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — matching points to intervals without the
  * O(n x m) theta-join Spark would otherwise plan for
  * `point BETWEEN lo AND hi`: the classic BINNING decomposition. Intervals
  * explode to the fixed-width bins they overlap, points map to their single
  * bin, and the match becomes an EQUI-join on the bin id (hash join,
  * shuffle on bin) followed by the exact BETWEEN filter. A point lies in
  * exactly one bin and an interval covers that bin at most once, so no
  * dedup pass is needed — the bin join emits each true (point, interval)
  * pair exactly once.
  *
  * `binWidth` trades replication for balance: intervals produce
  * `ceil(span / binWidth) + 1` rows. Set it near the typical interval span
  * so most intervals land in 1-2 bins. Skewed bins (many intervals over one
  * hot value range) behave like any skewed equi-join — AQE skew handling
  * or [[SkewJoin]] applies unchanged, which is the point of reducing to an
  * equi-join. */
object RangeJoin {

  /** Join `points` (value `valueCol`) to `intervals` (`[loCol, hiCol]`,
    * inclusive both ends) on containment. Output: all point columns + all
    * interval columns. */
  def joinPointInInterval(points: DataFrame, valueCol: String,
                          intervals: DataFrame, loCol: String, hiCol: String,
                          binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pBin = floor(col(s"`$valueCol`") / binWidth).cast("long")
    val iBins = sequence(
      floor(col(s"`$loCol`") / binWidth).cast("long"),
      floor(col(s"`$hiCol`") / binWidth).cast("long"))
    val p = points.withColumn("__bin", pBin)
    val i = intervals
      .where(col(s"`$loCol`") <= col(s"`$hiCol`"))
      .withColumn("__bin", explode(iBins))
    p.join(i, "__bin")
      .where(col(s"`$valueCol`").between(col(s"`$loCol`"), col(s"`$hiCol`")))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join: all pairs where
    * `[lLo,lHi]` and `[rLo,rHi]` intersect (inclusive ends) — session
    * overlap, concurrent-span analysis, temporal containment-with-slack.
    * Same binning reduction as the point join, with the classic
    * duplicate-free emission rule: two overlapping intervals co-occur in
    * every bin their overlap spans, so a pair is emitted ONLY from the bin
    * containing the overlap's start (`max(lLo, rLo)`) — exactly one bin
    * qualifies, so no distinct/dedup shuffle is ever needed. The plan is
    * one equi-join on the bin id plus exact predicates; skewed bins are an
    * ordinary skewed equi-join (AQE / [[SkewJoin]] apply unchanged).
    *
    * Inputs must have disjoint column names; both frames' columns are
    * returned. Bounds are integral (cast to long); `binWidth` near the
    * typical interval span keeps replication at ~2 bins per interval. */
  def joinIntervalOverlap(left: DataFrame, lLoCol: String, lHiCol: String,
                          right: DataFrame, rLoCol: String, rHiCol: String,
                          binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: ${overlap.mkString(", ")}")
    def bins(lo: String, hi: String) = sequence(
      expr(s"`$lo` div ${binWidth}L").cast("long"),
      expr(s"`$hi` div ${binWidth}L").cast("long"))
    val l = left.where(col(s"`$lLoCol`") <= col(s"`$lHiCol`"))
      .withColumn("__bin", explode(bins(lLoCol, lHiCol)))
    val r = right.where(col(s"`$rLoCol`") <= col(s"`$rHiCol`"))
      .withColumn("__bin", explode(bins(rLoCol, rHiCol)))
    l.join(r, "__bin")
      .where(col(s"`$lLoCol`") <= col(s"`$rHiCol`") &&
        col(s"`$rLoCol`") <= col(s"`$lHiCol`") &&
        col("__bin") === expr(s"greatest(`$lLoCol`, `$rLoCol`) div ${binWidth}L").cast("long"))
      .drop("__bin")
  }
}
