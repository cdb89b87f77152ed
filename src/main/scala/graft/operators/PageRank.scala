package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact PageRank power iteration over an edge table — the second
  * iterative graph operator next to [[Dedup.connectedComponents]], for
  * link-graph curation jobs (domain authority for crawl prioritization,
  * citation weighting for source mixing).
  *
  * All arithmetic is FIXED-POINT: ranks live on an integer grid of
  * `scale` (default 1e12), the damping factor is the exact rational
  * `dampNum/dampDen`, and every division is a positive-operand integer
  * floor — so the ranks after N rounds are bit-identical across engines,
  * executor counts, and reduction orders (integer addition commutes;
  * doubles would drift with aggregation order and break cross-engine
  * reproducibility, which is also why the `pagerank` oracle can recompute
  * every rank exactly in SQL).
  *
  * Scale shape per iteration: ranks join edges on src (both sides hash on
  * the node id — at 100 TB the edge table is pre-partitioned by src once
  * and every round reuses that exchange), contributions shuffle once on
  * dst with map-side partial sums, and a left join against the node set
  * restores zero-in-degree nodes at the teleport floor. Lineage is
  * truncated with a localCheckpoint every `checkpointEvery` rounds, the
  * same guard [[Dedup.connectedComponents]] uses — without it the plan
  * doubles per round and the driver, not the data, becomes the bottleneck.
  *
  * Mass note: per-edge floor division leaks up to (outdeg-1)/scale of a
  * node's mass per round — deliberate: determinism at 1e-12 granularity is
  * worth more to a reproducible pipeline than the last ulp of probability
  * mass. Dangling nodes (no out-edges) likewise retain only their teleport
  * share; callers modeling true random-walk semantics should pre-close the
  * graph (add self-loops) before calling.
  */
object PageRank {

  /** Ranks after `iters` rounds: (node:long, rank:long) on the `scale`
    * grid. `edges` needs (src, dst) long columns; `nodes` one long column
    * with every node id (drives teleport for zero-in-degree nodes).
    * NULL src/dst edges and NULL node ids are dropped up front: an edge
    * with no identity cannot route mass. */
  def ranks(edges: DataFrame, nodes: DataFrame, nodeCol: String = "node",
            iters: Int = 10, scale: Long = 1000000000000L,
            dampNum: Long = 85L, dampDen: Long = 100L,
            checkpointEvery: Int = 5): DataFrame =
    ranksFrom(edges, nodes, init = None, nodeCol, iters, scale,
      dampNum, dampDen, checkpointEvery)

  /** WARM-START power iteration — the incremental member of the graph-rank
    * family (the stored-labeling CC / stored-IVF-probe pattern applied to
    * PageRank): a daily link-graph job initializes from YESTERDAY'S stored
    * (node, rank) vector instead of the uniform distribution, so the
    * iteration starts near the fixpoint and needs a fraction of the
    * rounds to re-converge after an incremental edge batch. Nodes absent
    * from `init` (newly discovered pages) start at the uniform cold rank;
    * stored ranks for nodes that left the graph are ignored (inner
    * semantics via the node-set left join). The result after k rounds is
    * integer-exact from (edges, nodes, init, k) — same grid, same floor
    * divisions — so the oracle replays the warm chain as CTEs seeded from
    * the replayed day-0 ranks. Convergence of power iteration is
    * init-independent (the damping contraction), so warm == cold at the
    * fixpoint; warm just gets there in fewer rounds — measured, not
    * assumed, by `pagerank_incremental`. */
  def ranksFrom(edges: DataFrame, nodes: DataFrame, init: Option[DataFrame],
                nodeCol: String = "node",
                iters: Int = 10, scale: Long = 1000000000000L,
                dampNum: Long = 85L, dampDen: Long = 100L,
                checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen, "damping must be in [0,1]")
    val n = nodes.select(col(s"`$nodeCol`").cast("long").as("node"))
      .where(col("node").isNotNull)
    val e = Partitioning.spread(edges.select(
      col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
      .where(col("src").isNotNull && col("dst").isNotNull)

    // one count to size the teleport floor — same one-job bootstrap every
    // pagerank implementation pays; the result is a literal in the plan
    val nNodes = n.count()
    require(nNodes > 0, "pagerank needs at least one node")
    val teleport = (scale * (dampDen - dampNum) / dampDen) / nNodes
    val r0 = scale / nNodes

    // outdegree once, fused onto the edge table so each round's join
    // carries (src, dst, outdeg) and the per-edge share needs no extra
    // join; laid out by src BEFORE the checkpoint (LogicalRDD keeps the
    // physical partitioning) so every round's src-keyed join reuses this
    // one exchange and only the node-sized rank frame moves — without it
    // each round re-shuffled the full edge table
    val eo = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src"))
      .repartition(col("src"))
      .localCheckpoint(eager = false)

    var ranks = init match {
      case None => n.select(col("node"), lit(r0).as("rank"))
      case Some(st) =>
        n.join(st.select(col("node").cast("long").as("node"),
            col("rank").cast("long").as("__init_rank"))
            .where(col("node").isNotNull), Seq("node"), "left")
          .select(col("node"), coalesce(col("__init_rank"), lit(r0)).as("rank"))
    }
    var round = 0
    while (round < iters) {
      val contrib = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr(s"($dampNum * rank) div ($dampDen * outdeg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      ranks = n.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + coalesce(col("in_mass"), lit(0L))).as("rank"))
      round += 1
      if (round % checkpointEvery == 0 && round < iters)
        ranks = ranks.localCheckpoint(eager = true)
    }
    ranks
  }
}
