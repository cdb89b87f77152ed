package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-count hygiene for CPU-bound stages.
  *
  * A small parquet table arrives as one input split, so a KDF / MinHash /
  * dot-product stage would run on ONE core no matter how many the cluster
  * has. `spread` repartitions ONLY when the input has fewer partitions than
  * the session's default parallelism — on a real multi-TB input (thousands
  * of splits) it is a no-op, so the extra shuffle exists precisely when it
  * is cheap and the CPU win is large.
  */
object Partitioning {

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Materialize `result` into its own (small) cache, then RELEASE the
    * expensive `intermediates` caches. Operators whose plan reuses a heavy
    * intermediate (shingle sets, gram arrays, signature bases) persist it for
    * the duration of one call only — a long-lived session running many such
    * operators must not accumulate storage blocks until eviction (advisor
    * finding r2). The returned frame is cached; callers may `unpersist()` it
    * when finished. */
  def materializeAndRelease(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    intermediates.foreach(_.unpersist(false))
    out
  }
}
