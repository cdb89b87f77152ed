package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling for training epochs — every run over the
  * same data with the same seed must visit documents in the same order, on
  * any cluster layout (the reproducibility contract training jobs need),
  * and a new epoch (new seed) must be a fresh permutation.
  *
  * The order key is engine-portable integer arithmetic on the 2^32 ring
  * (the [[Sampling]] hash family with a seed mixed in), so any engine can
  * recompute the exact order; ties (hash collisions) break by id.
  *
  * Scale shape: a total order WITHOUT a single-node sort —
  * `repartitionByRange` samples key bounds and gives disjoint, ordered
  * partition ranges; `sortWithinPartitions` orders each range locally.
  * Reading partitions in index order yields the global permutation;
  * writing them produces ordered training shards. This is exactly how a
  * 100 TB corpus gets epoch-shuffled: one range exchange, N local sorts,
  * no driver involvement.
  */
object Shuffling {

  /** The portable epoch-order key: `(id * 2654435761 + seed') mod 2^32`,
    * computed in Long arithmetic (exact — see [[Sampling]] for why the
    * wrap-around matches wider-integer engines). */
  def epochKey(id: Column, seed: Long): Column = {
    // mix the seed through the same multiplicative constant so seed 0 and
    // seed 1 produce unrelated orders (an additive raw seed would just
    // rotate the ring)
    val mixed = (seed * 2654435761L) ^ (seed >>> 17)
    pmod(id.cast("long") * 2654435761L + lit(mixed), lit(4294967296L))
  }

  /** Shuffle `df` into `numPartitions` ordered shards for one epoch.
    * Output carries `epoch_key`; partitions are range-disjoint and each is
    * locally sorted by (epoch_key, id) — concatenating them in partition
    * order is the global permutation. */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
                   numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sparkContext.defaultParallelism
    df.withColumn("epoch_key", epochKey(col(s"`$idCol`"), seed))
      .repartitionByRange(n, col("epoch_key"), col(s"`$idCol`"))
      .sortWithinPartitions(col("epoch_key"), col(s"`$idCol`"))
  }
}
