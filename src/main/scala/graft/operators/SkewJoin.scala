package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime, but it cannot help when a single join KEY is hot (all rows for
  * the key hash to one partition regardless of splits on the other side).
  * Salting fixes the key itself: the skewed (big) side scatters each key
  * across `salts` sub-keys; the small side replicates each row `salts`
  * times. The join then distributes the hot key over `salts` tasks.
  *
  * Use when one side is too large to broadcast AND key frequency is heavily
  * skewed (e.g. a null-ish default key holding 10% of a 100 TB fact table).
  * Cost: small side inflates x salts — keep salts modest (8-64).
  */
object SkewJoin {

  private val SupportedJoinTypes = Set("inner", "left", "left_outer", "leftouter")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts >= 1)
    // right/full outer would emit each unmatched small-side row `salts` times
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin preserves semantics only for $SupportedJoinTypes, got '$joinType'")
    val saltCol = "__graft_salt"
    // Salt derived from row CONTENT, not rand(): under task retry after a
    // shuffle, a recomputed partition re-assigns identical salts, so already
    // fetched shuffle blocks stay consistent (the rand-in-repartition hazard,
    // SPARK-23207). xxhash64 over all columns spreads hot keys just as well.
    val saltedBig = big.withColumn(saltCol,
      pmod(xxhash64(big.columns.map(c => big(s"`$c`")).toIndexedSeq: _*), lit(salts)).cast("int"))
    val saltedSmall = small
      .withColumn(saltCol, explode(sequence(lit(0), lit(salts - 1))))
    val joined = saltedBig.join(saltedSmall,
      saltedBig(s"`$key`") === saltedSmall(s"`$key`") && saltedBig(saltCol) === saltedSmall(saltCol),
      joinType)
    // drop the salt and the duplicate key column from the small side
    val smallCols = small.columns.filter(_ != key).map(c => saltedSmall(s"`$c`"))
    joined.select(big.columns.map(c => saltedBig(s"`$c`")).toIndexedSeq ++ smallCols: _*)
  }
}
