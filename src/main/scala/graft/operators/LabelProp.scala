package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation over an undirected edge table — the
  * community counterpart to [[PageRank]] (authority) and
  * [[Dedup.connectedComponents]] (reachability). Communities are the
  * mid-granularity signal a curation pipeline wants when CC is too coarse
  * (everything touching anything collapses) and per-pair similarity too
  * fine: near-dup *families*, crawl host clusters, co-interaction groups.
  *
  * Semantics are the classic LPA update made deterministic: every node's
  * label starts as its own id; each round, a node adopts the most frequent
  * label among its NEIGHBORS (not itself), breaking count ties toward the
  * SMALLEST label. Updates are synchronous (round r reads only round r-1
  * labels), so after a fixed number of rounds the labeling is a pure
  * function of the edge set — bit-identical across engines, executor
  * counts, and reduction orders, which is what lets the `label_prop`
  * oracle replay every round as a chained SQL CTE. Synchronous LPA can
  * oscillate on bipartite structures instead of converging; a fixed round
  * budget makes that a documented property, not a hang.
  *
  * Scale shape per round: one join of the (node, label) frame onto the
  * symmetrized edge table (both sides hash on the node id — at 100 TB the
  * edge table is repartitioned by neighbor once, persisted, and every
  * round reuses that layout, so only the node-sized label frame moves),
  * then one (node, label)-keyed count with map-side partial aggregation,
  * then the argmax as a single lexicographic struct max — never a
  * per-node window sort. Lineage is truncated with a localCheckpoint
  * every `checkpointEvery` rounds, the same driver-side guard the other
  * iterative operators use.
  */
object LabelProp {

  /** Labels after `iters` synchronous rounds: (node:long, label:long).
    * `edges` needs (src, dst) long columns and is treated as UNDIRECTED:
    * each edge votes in both directions, self-loops and duplicate edges
    * are dropped (a duplicate would double a neighbor's vote and make the
    * result depend on upstream dedup discipline). Nodes absent from
    * `nodes` are ignored; nodes with no surviving edge keep their own id
    * as label. NULL ids/endpoints are dropped: an edge with no identity
    * cannot vote. */
  def communities(edges: DataFrame, nodes: DataFrame, nodeCol: String = "node",
                  iters: Int = 5, checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val n = nodes.select(col(s"`$nodeCol`").cast("long").as("node"))
      .where(col("node").isNotNull)
    val e0 = Partitioning.spread(edges.select(
      col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    // symmetrize, dedup, and lay out by the JOIN side (nbr) once; every
    // round's join then reuses this exchange and only labels move
    val sym = e0.select(col("src").as("node"), col("dst").as("nbr"))
      .union(e0.select(col("dst").as("node"), col("src").as("nbr")))
      .distinct()
      .repartition(col("nbr"))
      .localCheckpoint(eager = false)

    var labels = n.select(col("node"), col("node").as("label"))
    var round = 0
    while (round < iters) {
      val votes = sym.join(labels.withColumnRenamed("node", "nbr"), Seq("nbr"))
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // argmax by (cnt desc, label asc) as one lexicographic struct max:
      // labels are non-negative, so max of -label is the smallest label
      val winner = votes
        .groupBy(col("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("w"))
        .select(col("node"), (-col("w.neg")).as("label"))
      labels = n.join(winner, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
      round += 1
      if (round % checkpointEvery == 0 && round < iters)
        labels = labels.localCheckpoint(eager = true)
    }
    labels
  }
}
