package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969,
  * JASA) over sorted-neighborhood candidates: each candidate pair gets a
  * per-field agreement vector, each agreement contributes a fixed
  * log-odds weight (positive for agree, negative for disagree), and the
  * summed score places the pair in the match / possible / non-match
  * decision bands. The classical entity-resolution scorer that sits on
  * top of any blocking scheme — here the same single-shuffle SNM pass as
  * [[SortedNeighborhood]] (candidates are `lead()` neighbors inside
  * block-partitioned windows, n·(window−1) by construction, no
  * bucket-quadratic term).
  *
  * Determinism contract: weights are caller-supplied INTEGERS (scaled
  * log-odds — the standard practice of fixing weights from a reviewed
  * m/u-probability table rather than re-estimating them per run), so the
  * score is exact integer arithmetic and two engines can replay it
  * bit-for-bit. Null field values fail the agreement predicate and take
  * the disagreement weight (document rules accordingly, or encode
  * null-handling inside the predicate).
  *
  * Scale shape: ONE hash-shuffle per pass on the block prefix plus an
  * in-partition sort; the record struct rides the window (bounded by the
  * rule fields, not the full row), agreement predicates and the score
  * run in the projection after the window — nothing pair-quadratic, no
  * join. Multi-pass union re-blocks under a second key exactly like
  * [[SortedNeighborhood.candidatesWithDist]].
  */
object RecordLinkage {

  /** One field's contribution: `agree(a, b)` is the agreement predicate
    * over the two sides' values; `wAgree` (> 0) and `wDisagree` (< 0)
    * are the scaled log-odds weights log(m/u) and log((1−m)/(1−u)). */
  final case class FieldRule(field: String, agree: (Column, Column) => Column,
                             wAgree: Long, wDisagree: Long) {
    require(wAgree > 0 && wDisagree < 0,
      s"FS weights for '$field' must satisfy wAgree > 0 > wDisagree " +
        "(log-odds of agreement among matches vs non-matches)")
  }

  /** Candidate pairs from SNM passes under each `keys` entry, each pair
    * carrying both records' rule fields: (id_a, id_b, a struct, b struct)
    * with id_a < id_b, distinct across passes. The window/orientation
    * machinery is [[SortedNeighborhood.snmPass]] — one shared copy. */
  def candidates(df: DataFrame, idCol: String, keys: Seq[Column],
                 fields: Seq[String], window: Int = 5, blockLen: Int = 4): DataFrame = {
    require(keys.nonEmpty, "at least one SNM sort key")
    require(window >= 2 && window <= 64, "window in [2, 64] — candidates are n*(window-1) per pass")
    require(blockLen >= 1, "blockLen >= 1")
    val rec = struct(fields.distinct.map(f => col(s"`$f`")): _*)
    val passes = keys.map { key =>
      SortedNeighborhood.snmPass(
          df.where(col(s"`$idCol`").isNotNull && key.isNotNull)
            .select(col(s"`$idCol`").cast("long").as("id"),
              key.as("__key"), rec.as("__pay")),
          window, blockLen)
        .select(col("id_a"), col("id_b"), col("pay_a").as("a"), col("pay_b").as("b"))
    }
    passes.reduce(_ unionByName _).dropDuplicates("id_a", "id_b")
  }

  /** FS-scored candidates: (id_a, id_b, n_agree, score) with the integer
    * log-odds sum; classification into decision bands is the caller's
    * `when(score >= tMatch, ...)` — thresholds are policy, not scoring. */
  def fsScores(df: DataFrame, idCol: String, keys: Seq[Column], rules: Seq[FieldRule],
               window: Int = 5, blockLen: Int = 4): DataFrame = {
    require(rules.nonEmpty, "at least one field rule")
    val cand = candidates(df, idCol, keys, rules.map(_.field), window, blockLen)
    val agreeFlags = rules.map(r =>
      coalesce(r.agree(col(s"a.`${r.field}`"), col(s"b.`${r.field}`")), lit(false)))
    val score = rules.zip(agreeFlags).map { case (r, f) =>
      when(f, lit(r.wAgree)).otherwise(lit(r.wDisagree))
    }.reduce(_ + _)
    val nAgree = agreeFlags.map(f => when(f, lit(1L)).otherwise(lit(0L))).reduce(_ + _)
    cand.select(col("id_a"), col("id_b"),
      nAgree.as("n_agree"), score.cast("long").as("score"))
  }
}
