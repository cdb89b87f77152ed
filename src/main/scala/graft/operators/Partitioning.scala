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
}
