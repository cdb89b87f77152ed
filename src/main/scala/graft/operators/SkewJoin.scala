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

  /** Whether a type participates in xxhash64 (hashing Map types — even
    * nested — is disallowed since Spark 3.0). */
  private def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => false
    case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
    case _ => true
  }

  /** The deterministic salt expression: xxhash64 over `saltCols` (or every
    * hashable column) mod `salts`. Content-derived, not rand(): under task
    * retry after a shuffle, a recomputed partition re-assigns identical
    * salts, so already-fetched shuffle blocks stay consistent (the
    * rand-in-repartition hazard, SPARK-23207). Map-typed columns are
    * excluded (un-hashable since Spark 3.0). */
  def saltColumn(df: DataFrame, salts: Int, saltCols: Seq[String] = Nil): Column = {
    val basis =
      if (saltCols.nonEmpty) saltCols
      else df.schema.fields.filter(f => hashable(f.dataType)).map(_.name).toSeq
    require(basis.nonEmpty, "no hashable columns to derive a deterministic salt from")
    pmod(xxhash64(basis.map(c => df(s"`$c`")).toIndexedSeq: _*), lit(salts)).cast("int")
  }

  /** @param saltCols columns the deterministic salt is derived from. Default
    *        (empty) = every hashable column. IMPORTANT: byte-identical rows
    *        get the SAME salt, so a hot key made of exact duplicate rows is
    *        NOT spread — pass a surrogate/unique id column here (e.g. the
    *        fact table's row id) whenever one exists. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 joinType: String = "inner", saltCols: Seq[String] = Nil): DataFrame = {
    require(salts >= 1)
    // right/full outer would emit each unmatched small-side row `salts` times
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin preserves semantics only for $SupportedJoinTypes, got '$joinType'")
    val saltCol = "__graft_salt"
    val saltedBig = big.withColumn(saltCol, saltColumn(big, salts, saltCols))
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
