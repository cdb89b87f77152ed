package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus diff for iterated training-data builds:
  * classify every document id as `added` / `removed` / `changed` between
  * two corpus versions (re-crawls, re-filters, upstream refreshes).
  *
  * Scale shape: the full outer join is unavoidable — but it must move
  * fingerprints, not documents. Each side is projected to
  * `(id, 128-bit content fingerprint)` BEFORE the shuffle (two
  * independently-seeded xxhash64s over the null-tagged compare columns),
  * so diffing two 100 TB snapshots shuffles ~28 bytes per row per side.
  * Catalyst plans a sort-merge join on the id; AQE coalesces the output.
  * Unchanged rows — the overwhelming majority of a steady-state refresh —
  * are filtered out by default (`emitUnchanged = false`) so the result is
  * proportional to the churn, not the corpus.
  *
  * Null semantics: each compare column is hashed with a null tag distinct
  * from any value image (the [[Dedup]] exact-key convention), so
  * null -> 'x' and 'x' -> null both classify as `changed`, and two nulls
  * compare equal.
  */
object Versioning {

  private def fingerprint(compareCols: Seq[String], seed: Int) = {
    val parts = compareCols.map { c =>
      val v = col(s"`$c`").cast("string")
      when(v.isNull, lit("N")).otherwise(concat(lit("V"), v))
    }
    xxhash64((lit(seed) +: parts): _*)
  }

  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String,
      compareCols: Seq[String], emitUnchanged: Boolean = false): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    def side(df: DataFrame, tag: String) = df.select(
      col(s"`$idCol`").as(s"id_$tag"),
      fingerprint(compareCols, 0).as(s"f1_$tag"),
      fingerprint(compareCols, 1).as(s"f2_$tag"))

    val joined = side(v1, "a").join(side(v2, "b"),
      col("id_a") === col("id_b"), "full_outer")

    val status = when(col("id_a").isNull, "added")
      .when(col("id_b").isNull, "removed")
      .when(col("f1_a") === col("f1_b") && col("f2_a") === col("f2_b"), "unchanged")
      .otherwise("changed")

    val out = joined.select(
      coalesce(col("id_a"), col("id_b")).as(idCol),
      status.as("status"))
    if (emitUnchanged) out else out.filter(col("status") =!= "unchanged")
  }
}
