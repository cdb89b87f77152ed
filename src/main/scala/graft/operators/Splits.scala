package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate-aware dataset splitting — train/val/test assignment with
  * the guarantee every evaluation pipeline actually needs: two documents
  * that are near-duplicates of each other NEVER land in different splits
  * (otherwise the val/test sets leak paraphrases of training documents and
  * benchmark numbers inflate).
  *
  * Mechanism: the split key of a document is the representative (min id)
  * of its near-dup connected component — its own id when unclustered — and
  * assignment is the same deterministic, engine-portable integer hash as
  * [[Sampling]] (`h(key) < cumulative-cutoff` over the 2^32 ring). Every
  * member of a cluster shares the key, hence the split; membership is
  * reproducible bit-for-bit by any engine from the pair set alone.
  *
  * Scale shape: [[Dedup.connectedComponents]] is delta-iterated (frontier
  * joins); the label frame holds only CLUSTERED docs (a vanishing fraction
  * of a deduplicated corpus), so the assignment join is one equi-join of
  * the corpus against a much smaller frame (AQE broadcasts it when small),
  * followed by a narrow codegen'd CASE filter. No extra corpus shuffle.
  */
object Splits {

  /** Assign each row a split name. `splits` are (name, basis points),
    * summing to 10000; assignment boundaries are cumulative. Returns the
    * input plus `split_key` (the component-or-self id) and `split`. */
  def clusterStableSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                         splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 10000,
      "split basis points must sum to 10000")
    require(splits.map(_._1).distinct.size == splits.size, "split names must be unique")
    val comp = Dedup.connectedComponents(pairs)
      .select(col("id").as("__graft_cid"), col("component").as("__graft_component"))
    val keyed = df.join(comp, df(s"`$idCol`") === col("__graft_cid"), "left")
      .withColumn("split_key",
        coalesce(col("__graft_component"), col(s"`$idCol`").cast("long")))
      .drop("__graft_cid", "__graft_component")
    val h = Sampling.idHash(col("split_key"))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    // chain ascending: h < cut(cum_1) -> split 1, else h < cut(cum_2) -> ...
    // (the last cutoff is the full ring, so the chain is total)
    val assigned = splits.zip(cum).reverse.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), c)) => when(h < Sampling.cutoff(c), name).otherwise(acc)
    }
    keyed.withColumn("split", assigned)
  }
}
