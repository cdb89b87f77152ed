package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-pass sorted-neighborhood blocking (Hernández & Stolfo 1995, the
  * merge/purge method): sort the corpus by a fuzzy key, compare each
  * record only against its `window - 1` successors, and run SEVERAL
  * passes with different keys so records that sort apart under one key
  * meet under another. The classic entity-resolution complement to the
  * similarity-join families: candidate count is n·(window-1) per pass BY
  * CONSTRUCTION — no bucket-size quadratic term at all, which is the
  * regime where even capped LSH buckets get expensive.
  *
  * Spark shape: each pass is ONE hash-shuffle on the block prefix plus an
  * in-partition sort (the `Window.partitionBy(block).orderBy(key)`
  * physical plan), and candidates come from `lead()` — no self-join, no
  * join-key explosion. Windows never cross block boundaries (the
  * documented recall trade of blocked SNM; the multi-pass union is the
  * standard mitigation). Verification cost is bounded by the candidate
  * count, so the whole operator is linear in the corpus for a fixed
  * window and pass count. */
object SortedNeighborhood {

  /** Candidate pairs from one SNM pass over a frame shaped (id, __key,
    * __pay): records adjacent within `window` under `__key`, blocked by
    * the key's first `blockLen` characters, each pair carrying both
    * sides' payloads oriented so pay_a belongs to the smaller id.
    * Payload-generic so the text family here and the multi-field
    * Fellegi–Sunter scorer ([[RecordLinkage]]) share ONE copy of the
    * window/orientation machinery (review r12: two drifting copies of
    * this subtle logic is how a tie-break fix silently misses one). */
  private[operators] def snmPass(base: DataFrame, window: Int,
                                 blockLen: Int): DataFrame = {
    val key = col("__key")
    val blk = substring(key, 1, blockLen)
    val w = Window.partitionBy(blk).orderBy(key.asc, col("id").asc)
    base
      .withColumn("__nbrs", array((1 until window).map(i =>
        struct(lead(col("id"), i).over(w).as("nid"),
          lead(col("__pay"), i).over(w).as("npay"))): _*))
      .select(col("id"), col("__pay"), explode(col("__nbrs")).as("n"))
      .where(col("n.nid").isNotNull)
      .select(
        least(col("id"), col("n.nid")).as("id_a"),
        greatest(col("id"), col("n.nid")).as("id_b"),
        when(col("id") <= col("n.nid"), col("__pay")).otherwise(col("n.npay")).as("pay_a"),
        when(col("id") <= col("n.nid"), col("n.npay")).otherwise(col("__pay")).as("pay_b"))
  }

  /** Text-payload pass: the original SNM shape. */
  private def passCandidates(base: DataFrame, key: Column, window: Int,
                             blockLen: Int): DataFrame =
    snmPass(base.select(col("id"), key.as("__key"), col("__txt").as("__pay")),
        window, blockLen)
      .select(col("id_a"), col("id_b"),
        col("pay_a").as("text_a"), col("pay_b").as("text_b"))

  /** All distinct candidate pairs from both passes, each verified with
    * THRESHOLD-bounded Levenshtein: (id_a, id_b, dist) with id_a < id_b,
    * `dist` in [0, maxDist] when the pair is within the bound and -1
    * otherwise. The threshold form is the scale-relevant choice: Spark's
    * banded DP costs O(len·maxDist) per candidate instead of O(len²) —
    * measured at sf0.1 the full-matrix verify dominated the whole
    * operator (6.9 s; the band cuts the verify arithmetic ~len/maxDist ≈
    * 100×) — and a pair past the bound carries no usable distance anyway.
    *
    * Default passes are the normalized text and its REVERSE — edits near
    * the string head destroy prefix adjacency but leave the reversed
    * key's prefix (the original's suffix) intact, so the two passes cover
    * head- and tail-edits respectively; measured on the planted variant
    * set the second pass lifts pair recall from 16/50 to 50/50. */
  def candidatesWithDist(df: DataFrame, idCol: String, textCol: String,
                         window: Int = 5, blockLen: Int = 4, maxDist: Int = 2): DataFrame = {
    require(window >= 2 && window <= 64, "window in [2, 64] — candidates are n*(window-1) per pass")
    require(blockLen >= 1, "blockLen >= 1")
    require(maxDist >= 0, "maxDist >= 0")
    val base = df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").cast("long").as("id"),
        col(s"`$textCol`").as("__txt"),
        lower(trim(col(s"`$textCol`"))).as("__key"))
    val c1 = passCandidates(base, col("__key"), window, blockLen)
    val c2 = passCandidates(base.withColumn("__key", reverse(col("__key"))),
      col("__key"), window, blockLen)
    c1.unionByName(c2)
      .dropDuplicates("id_a", "id_b")
      .withColumn("dist",
        levenshtein(col("text_a"), col("text_b"), maxDist).cast("long"))
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Near-duplicate pairs: candidates within `maxDist` edits. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            window: Int = 5, blockLen: Int = 4, maxDist: Int = 2): DataFrame =
    candidatesWithDist(df, idCol, textCol, window, blockLen, maxDist)
      .where(col("dist") >= 0)
}
