package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Annotation reconciliation for labeled training data (SFT/RLHF label
  * aggregation, eval-set gold labels): collapse multiple annotators'
  * votes per example into one majority label plus the agreement
  * diagnostics a curation pipeline gates on.
  *
  * Per example: the majority `label` (ties break to the lexicographically
  * smallest top-voted label, so the result is deterministic), `n_votes`,
  * `n_labels` (distinct labels cast), `top_n` (votes for the winner),
  * `n_top` (how many labels tied at `top_n` — >1 flags a contested
  * example), and the integer agreement rate `agreement_x1e4 =
  * top_n * 10000 div n_votes` (engine-portable, no float drift).
  *
  * Scale shape: votes pre-aggregate map-side into (example, label)
  * counts before the first shuffle, so the raw vote volume never moves;
  * the second exchange re-clusters those counts by example alone (at
  * most |labels| rows per example — strictly smaller than the first
  * shuffle) for the window max, and the final fold reuses that window
  * partitioning with no further exchange. No self-joins, no collect;
  * output is one row per example.
  */
object Labeling {

  /** Per-annotator reliability report: each annotator's agreement with
    * the reconciled majority ([[majorityVote]]) — the quality monitor
    * that catches a drifting or adversarial labeler before their votes
    * poison the gold set. Per annotator: `n_votes`, `n_majority` (votes
    * that matched the majority label, null-safe), and the integer rate
    * `majority_x1e4`. Contested examples (`n_top > 1`) are excluded —
    * agreement with a tie-broken winner is luck, not reliability.
    *
    * Scale shape: the majority frame is one row per example — the
    * vote table's natural reduction — and joins back to votes on the
    * example key (equi-join, co-partitioned with majorityVote's own
    * shuffle); the final per-annotator fold is an aggregation to
    * |annotators| rows. */
  def annotatorReport(votes: DataFrame, exampleCol: String,
      annotatorCol: String, labelCol: String): DataFrame = {
    val majority = majorityVote(votes, exampleCol, labelCol)
      .where(col("n_top") === 1)
      .select(col(s"`$exampleCol`"), col("label").as("__maj"))
    votes.join(majority, Seq(exampleCol))
      .groupBy(col(s"`$annotatorCol`").as(annotatorCol))
      .agg(
        count(lit(1)).as("n_votes"),
        sum(when(col(s"`$labelCol`") <=> col("__maj"), 1L).otherwise(0L))
          .as("n_majority"))
      .withColumn("majority_x1e4", expr("n_majority * 10000 div n_votes"))
  }

  /** Fleiss' κ sufficient statistics — the chance-corrected MULTI-rater
    * agreement coefficient ([[annotatorReport]] scores each rater against
    * the majority; κ scores the panel as a whole, the number an eval-set
    * audit quotes). Only items with exactly `nRaters` votes participate
    * (Fleiss' model requires a constant panel size; partially-labeled
    * items are reported in `n_dropped`, not silently mixed in).
    *
    * With N items, n raters, n_ij votes for label j on item i and
    * c_j = Σ_i n_ij:  P̄ = (Σ n_ij² − Nn) / (Nn(n−1)) and
    * P̄e = Σ c_j² / (Nn)², so  κ = (P̄ − P̄e)/(1 − P̄e) reduces — after
    * multiplying through by (Nn)²·Nn(n−1) and cancelling the common Nn —
    * to the INTEGER ratio `kappa_num / kappa_den` with
    * kappa_num = (S2 − Nn)·Nn − (n−1)·C2 and
    * kappa_den = (n−1)·((Nn)² − C2), S2 = Σ n_ij², C2 = Σ c_j².
    * The output is those exact longs (never a float division for engines
    * to disagree about); the magnitudes stay inside Long up to N ~ 1e8
    * items at n ≤ 5 — divide the vote table first beyond that.
    *
    * Scale shape: one map-side-combined (item, label) count shuffle, a
    * one-row reduction for (N, S2), and a |labels|-row reduction for C2 —
    * the vote volume moves once, items never pairwise-join.
    *
    * Output (one row): n_items, n_raters, n_dropped, s2_sum, cj2_sum,
    * kappa_num, kappa_den (κ = num/den; den = 0 ⟺ every vote ever cast
    * is the same label, where κ is undefined). */
  def fleissStats(votes: DataFrame, exampleCol: String, labelCol: String,
      nRaters: Int): DataFrame = {
    require(nRaters >= 2, "Fleiss' kappa needs at least 2 raters")
    val counts = votes
      .where(col(s"`$exampleCol`").isNotNull && col(s"`$labelCol`").isNotNull)
      .groupBy(col(s"`$exampleCol`").as("example"), col(s"`$labelCol`").as("label"))
      .agg(count(lit(1)).as("nij"))
    val perItem = counts.groupBy(col("example"))
      .agg(sum(col("nij")).as("ni"), sum(col("nij") * col("nij")).as("s2i"))
    val eligible = perItem.where(col("ni") === nRaters)
    val itemStats = eligible.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum(col("s2i")), lit(0L)).as("s2_sum"))
    val dropped = perItem.where(col("ni") =!= nRaters)
      .agg(count(lit(1)).as("n_dropped"))
    // c_j over ELIGIBLE items only (left_semi keeps the count shuffle's
    // partitioning; eligible is item-count sized, not vote sized)
    val cj = counts.join(eligible.select(col("example")), Seq("example"), "left_semi")
      .groupBy(col("label")).agg(sum(col("nij")).as("cj"))
    val cjStats = cj.agg(coalesce(sum(col("cj") * col("cj")), lit(0L)).as("cj2_sum"))
    itemStats.crossJoin(dropped).crossJoin(cjStats)
      .select(
        col("n_items"), lit(nRaters.toLong).as("n_raters"), col("n_dropped"),
        col("s2_sum"), col("cj2_sum"),
        ((col("s2_sum") - col("n_items") * nRaters) * (col("n_items") * nRaters)
          - lit(nRaters - 1L) * col("cj2_sum")).as("kappa_num"),
        (lit(nRaters - 1L) * ((col("n_items") * nRaters) * (col("n_items") * nRaters)
          - col("cj2_sum"))).as("kappa_den"))
  }

  def majorityVote(votes: DataFrame, exampleCol: String, labelCol: String): DataFrame = {
    val counts = votes
      .groupBy(col(s"`$exampleCol`").as("example"), col(s"`$labelCol`").as("label"))
      .agg(count(lit(1)).as("n"))
    val perExample = Window.partitionBy(col("example"))
    counts
      .withColumn("top_n", max(col("n")).over(perExample))
      .groupBy(col("example").as(exampleCol))
      .agg(
        min(when(col("n") === col("top_n"), col("label"))).as("label"),
        sum(col("n")).as("n_votes"),
        count(lit(1)).as("n_labels"),
        max(col("top_n")).as("top_n"), // constant per example; max is order-free
        sum(when(col("n") === col("top_n"), 1L).otherwise(0L)).as("n_top"))
      .withColumn("agreement_x1e4", expr("top_n * 10000 div n_votes"))
  }
}
