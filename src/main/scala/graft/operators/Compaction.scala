package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning: assign rows (or file-manifest entries)
  * to target-size output buckets so a rewrite produces uniformly sized
  * files instead of the small-file swarm that kills scan throughput at
  * 100 TB (every parquet footer is a driver-side open; a million 1 MB
  * files is a listing problem before it is an IO problem).
  *
  * The planner is METADATA-ONLY: it moves `(key, id, size)` triples, never
  * payloads — planning a 100 TB compaction shuffles a few GB of manifest.
  * Within each partition key, rows are walked in portable-hash order
  * (deterministic, engine-reproducible — see [[Sampling.idHash]]) and the
  * bucket is `floor(exclusive_running_sum / targetSize)`: pure integer
  * arithmetic, so any SQL engine replans the identical layout. Buckets can
  * overflow `targetSize` by at most one row — the standard streaming
  * bin-pack bound; an oversized row gets a bucket of its own.
  *
  * Scale shape: one shuffle of the narrow manifest on the partition key;
  * the per-key window is a partition-local sort of ~20-byte tuples. The
  * rewrite itself then repartitions by (key, bucket) — each output task
  * writes exactly one target-sized file.
  */
object Compaction {

  /** Per-row bucket assignment: `(key, id, size)` -> `(key, id, bucket)`.
    * `sizeCol` must be a non-negative integer column (bytes, chars,
    * tokens — any additive cost). */
  def planBuckets(df: DataFrame, keyCol: String, idCol: String,
      sizeCol: String, targetSize: Long): DataFrame = {
    require(targetSize > 0, "targetSize must be positive")
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__h"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
        col(s"`$keyCol`").as("__key"),
        col(s"`$idCol`").as("__id"),
        col(s"`$sizeCol`").cast("long").as("__size"))
      .withColumn("__h", Sampling.idHash(col("__id")))
      .withColumn("__cum", sum(col("__size")).over(w))
      .select(
        col("__key").as(keyCol),
        col("__id").as(idCol),
        // exclusive running sum: the bucket a row STARTS in. `div` is
        // integer division — a double `/` would round above 2^53
        expr(s"(__cum - __size) div ${targetSize}L").as("bucket"),
        col("__size").as("size"))
  }

  /** The compaction manifest: per (key, bucket) — file count, total size,
    * and the size skew the plan achieved. This is the driver's work list
    * for the rewrite stage. */
  def planSummary(df: DataFrame, keyCol: String, idCol: String,
      sizeCol: String, targetSize: Long): DataFrame =
    planBuckets(df, keyCol, idCol, sizeCol, targetSize)
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("size")).cast("long").as("bucket_size"))
}
