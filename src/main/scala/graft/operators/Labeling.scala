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
