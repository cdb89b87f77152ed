package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.ZOrderExpression

/** Multi-dimensional data clustering for scan-time skipping.
  *
  * A 100 TB table filtered on two independent keys can only be skipped
  * efficiently if files are TIGHT on both columns' min/max stats; a linear
  * sort gives that on one column and leaves the other uniform per file.
  * Z-ordering range-partitions + sorts on the Morton interleave of the
  * bucketed keys ([[graft.plans.ZOrder2]]), bounding every file to a small
  * hyper-rectangle of (x, y) — parquet/ORC row-group stats then prune
  * point/range predicates on either column.
  */
object Clustering {

  /** Bucket `xCol`/`yCol` into `2^bits` cells each (caller-supplied bucket
    * expressions must be non-negative bigints), compute the z key, and
    * range-partition + sort by it. `z` is kept as a column so callers and
    * tests can assert per-partition bounds; drop it before the write. */
  def zorderBy(df: DataFrame, xBucket: Column, yBucket: Column,
               bits: Int = 16, numPartitions: Int = 0): DataFrame = {
    val z = ZOrderExpression.zorder2(xBucket.cast("long"), yBucket.cast("long"), bits)
    val withZ = df.withColumn("z", z)
    val parts = if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("z"))
    else withZ.repartitionByRange(col("z"))
    parts.sortWithinPartitions(col("z"))
  }
}
