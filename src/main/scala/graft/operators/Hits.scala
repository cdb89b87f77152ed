package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact HITS (Kleinberg 1999, "Authoritative Sources in a
  * Hyperlinked Environment") — the hubs-and-authorities companion to
  * [[PageRank]] for link-graph curation: PageRank prices GLOBAL random-
  * walk importance, HITS separates "pages many good hubs point AT"
  * (authorities — fetch-priority candidates for a frontier) from "pages
  * that point at many good authorities" (hubs — directory/portal pages a
  * crawler mines for out-links but rarely keeps as corpus documents).
  *
  * All arithmetic is FIXED-POINT on an integer `scale` grid (the
  * [[PageRank]] discipline): each round computes raw sums over in-/out-
  * neighbors (integer addition — commutative, so executor count and
  * reduction order cannot change a bit) and renormalizes by the round's
  * MAX via positive-operand integer floor division (`div`), pinning the
  * largest score to `scale`. Scores after N rounds are bit-identical
  * across engines — the oracle replays every round as chained SQL CTEs.
  *
  * Overflow bound: a raw sum is at most |nodes|·scale and the
  * renormalization multiplies by `scale` before dividing, so the engine
  * requires |nodes|·scale² < 2⁶³ (9.2e6 nodes at the default 1e6 grid)
  * and THROWS rather than wraps; larger graphs raise the bound by
  * lowering `scale` or switching the renormalization to decimal
  * arithmetic.
  *
  * Scale shape per round: two edge-joins (each hashes edges and the
  * score vector on the shared node key — at 100 TB the edge table is
  * pre-partitioned once and every round reuses the exchange) with
  * map-side partial sums; the max is a 1-row driver action over the
  * round's eagerly-checkpointed raw frame, so lineage stays flat every
  * round — the [[PageRank]]/[[CcStar]] iterative guard, tightened
  * because the renormalization constant must be a plan literal. */
object Hits {

  /** (node, auth, hub) after `iters` rounds, both on the `scale` grid.
    * `edges` needs (src, dst) long columns; `nodes` one long column with
    * every node id (nodes without in-links hold authority 0, without
    * out-links hub 0 — isolated nodes stay at 0/0 after round 1). */
  def scores(edges: DataFrame, nodes: DataFrame, nodeCol: String = "node",
             iters: Int = 10, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "HITS needs at least one round")
    require(scale >= 1, "scale must be positive")
    // deliberately NOT checkpointed: a LogicalRDD loses the scan's size
    // statistics, demoting every renorm's node join from broadcast to
    // sort-merge (measured +1.7 s at sf0.1); the node scan is narrow and
    // column-pruned, and re-reading it per renorm is the cheaper side of
    // that trade at any scale where the node list broadcasts
    val n = nodes.select(col(s"`$nodeCol`").cast("long").as("node"))
      .where(col("node").isNotNull)
    val e = Partitioning.spread(edges.select(
        col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(eager = false)
    val nNodes = n.count()
    require(nNodes > 0, "HITS needs at least one node")
    require(nNodes <= Long.MaxValue / scale / scale,
      s"HITS overflow bound: |nodes| * scale^2 must stay below 2^63 " +
        s"($nNodes nodes at scale $scale) — lower the scale for this graph")

    // every round's raw-sum frame is EAGERLY checkpointed before its max
    // is read: the renormalization constant must be a plan LITERAL — a
    // per-round aggregate subtree nested under the next round's joins
    // recomputes the entire history once per round (measured: 10 rounds
    // at sf0.01 cost ~9 minutes before this flattening, ~2 s after)
    var hubs = n.select(col("node"), lit(scale).as("hub"))
    var auths: DataFrame = null
    var round = 0
    while (round < iters) {
      // LAZY checkpoint, materialized by renorm's own max() action: the
      // eager form ran a separate materialization job per half-round (4
      // driver actions per round where 2 suffice — renorm must read the
      // max anyway, and the checkpoint persists as a side effect of that
      // same job). Lineage truncation and the literal renorm constant are
      // unchanged; only the extra job per half-round is gone.
      val aRaw = e.join(hubs, e("src") === hubs("node"))
        .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("raw"))
        .localCheckpoint(eager = false)
      auths = renorm(aRaw, scale, "auth")
      val hRaw = e.join(auths, e("dst") === auths("node"))
        .groupBy(col("src").as("node")).agg(sum(col("auth")).as("raw"))
        .localCheckpoint(eager = false)
      hubs = renorm(hRaw, scale, "hub")
      round += 1
    }
    n.join(auths, Seq("node"), "left")
      .join(hubs, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("auth"), lit(0L)).as("auth"),
        coalesce(col("hub"), lit(0L)).as("hub"))
  }

  /** raw -> raw * scale div max(raw) over the checkpointed raw frame.
    * The max is one 1-row driver action per round (the CcStar
    * per-round-sync class; it also materializes the lazy checkpoint);
    * an all-zero round (edgeless graph) keeps zeros via the floor
    * division by 1.
    *
    * NOT restored over the full node set: a node absent from `raw` has
    * score 0, and a zero score contributes exactly nothing to the next
    * round's sums — joining the node table back in every half-round
    * only re-inserted rows the next join multiplies by zero (2·iters
    * node-table joins for bit-identical sums; the FINAL output restores
    * absents once in [[scores]]). */
  private def renorm(raw: DataFrame, scale: Long, out: String): DataFrame = {
    val mxRow = raw.agg(max(col("raw"))).collect()(0)
    val mx = if (mxRow.isNullAt(0)) 1L else math.max(mxRow.getLong(0), 1L)
    raw.select(col("node"),
      expr(s"(coalesce(raw, 0L) * $scale) div $mx").as(out))
  }
}
