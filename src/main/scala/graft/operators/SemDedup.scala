package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al. 2023, arXiv:2303.09540): partition vectors into semantic
  * clusters first, then prune cosine-near-duplicates WITHIN clusters only.
  *
  * Cluster-then-prune is what makes the operation tractable at 100 TB: the
  * pairwise comparison never crosses a cluster boundary, so the quadratic
  * term is bounded by the largest cluster, not the corpus. The cluster id
  * can come from [[Similarity.kmeansCentroids]]+[[Similarity.ivfAssign]]
  * (the SemDeDup paper's k-means lists), from an LSH bucket, or from any
  * upstream assignment already materialized in the table — this operator
  * takes it as a plain column and stays agnostic.
  *
  * Scale shape: one shuffle of (id, embedding) hashed on the cluster id for
  * the self-join, exact cosine verification inside each cluster through the
  * codegen'd [[graft.plans.VectorExpressions.dot]] kernel, then a broadcast
  * semi-join of the (small) dropped-id set back onto the table. With k-means
  * sized so clusters hold ~10^4 vectors (the paper's regime), the in-cluster
  * pair work per partition is bounded and embarrassingly parallel across
  * clusters. `maxCluster` is the skew guard: a degenerate assignment (every
  * vector in one list) fails loudly instead of scheduling a corpus-squared
  * task.
  *
  * Drop rule: a vector is dropped iff SOME earlier vector (smaller id) in
  * the same cluster has cosine >= `tau` with it. Anchoring on the earlier
  * id — rather than on the greedy "previously kept" chain — keeps the
  * decision per-pair and therefore order- and partitioning-independent:
  * every executor reaches the same verdict with no sequential dependency,
  * and an independent engine can reproduce the kept set exactly (the
  * `semantic_dedup` oracle does, in SQL). The greedy chain variant prunes a
  * subset of this rule's drops and needs a per-cluster sequential pass.
  *
  * Null contracts: rows with a NULL id, NULL cluster, or NULL embedding
  * never participate in pruning and are KEPT — a vector that cannot be
  * compared must not be silently deleted by a dedup pass.
  */
object SemDedup {

  private def norm(e: Column): Column = sqrt(graft.plans.VectorExpressions.dot(e, e))

  /** Within-cluster near-duplicate pairs (id_a < id_b, cosine >= tau).
    * One shuffle on the cluster id; `maxCluster` bounds the per-cluster
    * pair enumeration (skew guard, loud by design). */
  def withinClusterPairs(df: DataFrame, idCol: String, embCol: String,
                         clusterCol: String, tau: Double,
                         maxCluster: Int = 100000): DataFrame = {
    val base = Partitioning.spread(df.select(
      col(s"`$idCol`").cast("long").as("vec_id"),
      col(s"`$clusterCol`").cast("long").as("cluster"),
      col(s"`$embCol`").cast("array<double>").as("emb")))
      .where(col("vec_id").isNotNull && col("cluster").isNotNull && col("emb").isNotNull)
      .withColumn("nrm", norm(col("emb")))
      // zero-norm vectors have no direction: cosine is undefined, exclude
      .where(col("nrm") > 0.0)

    // skew guard as a FILTER on the join input (a filter condition cannot be
    // column-pruned away): each vector learns its cluster's size from a
    // broadcast-sized aggregate, and an oversized cluster raises before the
    // pair enumeration can schedule a corpus-squared task
    val sizes = base.groupBy(col("cluster")).agg(count(lit(1)).as("__cluster_n"))
    val guarded = base.join(broadcast(sizes), Seq("cluster"))
      .where(when(col("__cluster_n") > maxCluster,
        raise_error(concat(lit(s"semdedup cluster over $maxCluster vectors: "),
          col("cluster").cast("string"))).cast("boolean")).otherwise(lit(true)))
      .drop("__cluster_n")

    val a = guarded.select(col("cluster"), col("vec_id").as("id_a"),
      col("emb").as("emb_a"), col("nrm").as("nrm_a"))
    val b = guarded.select(col("cluster"), col("vec_id").as("id_b"),
      col("emb").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine",
        graft.plans.VectorExpressions.dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .where(col("cosine") >= tau)
      .select(col("cluster"), col("id_a"), col("id_b"), col("cosine"))
  }

  /** Kept rows after semantic pruning: `df` minus every row whose id has an
    * earlier same-cluster near-duplicate. The dropped-id set is the distinct
    * right side of [[withinClusterPairs]] — proportional to the duplicate
    * mass, not the corpus — joined back LEFT ANTI on the id. */
  def prune(df: DataFrame, idCol: String, embCol: String,
            clusterCol: String, tau: Double, maxCluster: Int = 100000): DataFrame = {
    val dropped = withinClusterPairs(df, idCol, embCol, clusterCol, tau, maxCluster)
      .select(col("id_b").as("__graft_drop")).distinct()
    df.join(dropped, col(s"`$idCol`") === col("__graft_drop"), "left_anti")
  }
}
