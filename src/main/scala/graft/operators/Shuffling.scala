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
    * the multiply through [[Sampling.idHash]]'s ANSI-safe split form
    * (a plain Long multiply throws on overflow under ANSI once ids pass
    * ~3.4e9 — see the Sampling scaladoc; the mod-2^32 result is
    * identical, so oracles keep the one-line HUGEINT formula). */
  def epochKey(id: Column, seed: Long): Column = {
    // mix the seed through the same multiplicative constant so seed 0 and
    // seed 1 produce unrelated orders (an additive raw seed would just
    // rotate the ring); driver-side Long wrap is fine HERE (not ANSI SQL)
    val mixed = (seed * 2654435761L) ^ (seed >>> 17)
    // ring-reduce the seed on the driver so the SQL-side sum stays < 2^33
    // for EVERY seed (a near-Long.MaxValue mixed seed would overflow the
    // addition under ANSI; (a + b) mod R == (a + b mod R) mod R)
    val mixedR = ((mixed % 4294967296L) + 4294967296L) % 4294967296L
    pmod(Sampling.idHash(id) + lit(mixedR), lit(4294967296L))
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
