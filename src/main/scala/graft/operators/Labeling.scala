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
