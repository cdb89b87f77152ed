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
}
