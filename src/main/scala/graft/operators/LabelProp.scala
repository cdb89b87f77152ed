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
  * per-node window sort. Each round eagerly localCheckpoints the
  * node-sized label frame (the iterative-self-join lineage guard shared
  * with [[Dedup.connectedComponents]]) and the round's changed-label
  * count rides that same job as a CollectMetrics observation
  * ([[Convergence.Latched]]), so the loop EXITS EARLY at a fixed point:
  * a synchronous round that changes zero labels is a fixed point of the
  * update map, every later round is identical, and the stop round is a
  * pure function of the edge set — determinism intact. Oscillating
  * (e.g. bipartite swap) structures never hit zero and run the full
  * `iters` budget, as documented above.
  */
object LabelProp {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Labels after `iters` synchronous rounds (or the fixed point, if one
    * is reached sooner): (node:long, label:long).
    * `edges` needs (src, dst) long columns and is treated as UNDIRECTED:
    * each edge votes in both directions, self-loops and duplicate edges
    * are dropped (a duplicate would double a neighbor's vote and make the
    * result depend on upstream dedup discipline). Nodes absent from
    * `nodes` are ignored; nodes with no surviving edge keep their own id
    * as label. NULL ids/endpoints are dropped: an edge with no identity
    * cannot vote. */
  def communities(edges: DataFrame, nodes: DataFrame, nodeCol: String = "node",
                  iters: Int = 5): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val spark = edges.sparkSession
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
    var fixedPoint = false
    val conv = new Convergence.Latched(spark, "lpa")
    while (round < iters && !fixedPoint) {
      val t0 = System.nanoTime()
      val votes = sym.join(labels.withColumnRenamed("node", "nbr"), Seq("nbr"))
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // argmax by (cnt desc, label asc) as one lexicographic struct max:
      // labels are non-negative, so max of -label is the smallest label
      val winner = votes
        .groupBy(col("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("w"))
        .select(col("node"), (-col("w.neg")).as("label"))
      // isolated nodes fall back to their OWN id (== their old label —
      // they never change), so diffing against the previous round's label
      // is exact; labels has n's node set as an invariant, so joining it
      // instead of n is the same frame plus the old label
      val (stepped, changed) = conv.observedRound(
        obsName => labels.select(col("node"), col("label").as("__old"))
          .join(winner, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("label"), col("node")).as("label"),
            (coalesce(col("label"), col("node")) =!= col("__old")).as("__changed"))
          .observe(obsName, count(when(col("__changed"), 1)).as("n_changed"))
          .localCheckpoint(eager = true),
        df => df.where(col("__changed")).count())
      labels = stepped.select(col("node"), col("label"))
      round += 1
      log.info(s"graft.lpa round=$round changed=$changed ms=${(System.nanoTime() - t0) / 1000000}")
      fixedPoint = changed == 0
    }
    log.info(s"graft.lpa fixedPoint=$fixedPoint rounds=$round budget=$iters")
    labels
  }

  /** EXACT integer Newman modularity of a labeling over an undirected
    * edge set — the quality score that tells you whether [[communities]]
    * found real structure or noise. Standard Q = Σ_c [ in_c/m −
    * (deg_c/2m)² ] is a rational with denominator 4m²; this returns the
    * integer numerator `q_x4m2 = Σ_c (4m·in_c − deg_c²)` alongside `m`,
    * so Q = q_x4m2 / (4m²) exactly and two engines can compare without a
    * single float (the oracle replays the integer form).
    *
    * `in_c` counts undirected intra-community edges, `deg_c` sums member
    * degrees, `m` is the undirected edge count after the same
    * symmetrize/dedup/self-loop discipline as [[communities]]. Scale
    * shape: one edge-keyed join against the node-sized label frame per
    * endpoint (the same layout the rounds use) and two
    * map-side-combined aggregates in a SINGLE pass — q_x4m2 factors as
    * m2·Σin2_c − Σdeg_c², so the half-edge count m2 = Σdeg_c comes out
    * of the same community aggregate instead of a separate count() job
    * that would materialize the edge⋈label frame twice. The Σ terms are
    * accumulated in DecimalType(38,0) (deg_c² alone wraps Long once a
    * community holds ~3e9 half-edges — reachable at 100 TB) and the
    * final cast back to BIGINT throws under ANSI instead of wrapping
    * silently, so overflow is loud. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e0 = Partitioning.spread(edges.select(
      col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    val sym = e0.select(col("src").as("node"), col("dst").as("nbr"))
      .union(e0.select(col("dst").as("node"), col("src").as("nbr")))
      .distinct()
    val lab = labels.select(col("node").cast("long").as("node"), col("label").cast("long").as("label"))
    // directed view: every undirected edge appears twice in sym
    val both = sym
      .join(lab.withColumnRenamed("node", "__n1").withColumnRenamed("label", "c1"),
        col("node") === col("__n1"))
      .join(lab.withColumnRenamed("node", "__n2").withColumnRenamed("label", "c2"),
        col("nbr") === col("__n2"))
      .select(col("c1"), col("c2"))
    val perC = both.groupBy(col("c1").as("community"))
      .agg(
        count(lit(1)).as("deg_c"), // sum of member degrees
        count(when(col("c1") === col("c2"), 1)).as("in2_c")) // 2 * in_c
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    perC.agg(
        count(lit(1)).cast("long").as("n_communities"),
        // Σ_c deg_c counts every directed half-edge exactly once = m2 = 2m
        sum(col("deg_c")).as("__m2"),
        sum(col("in2_c").cast(dec)).as("__in2_sum"),
        sum(col("deg_c").cast(dec) * col("deg_c").cast(dec)).as("__deg2_sum"))
      .select(
        col("n_communities"),
        // an empty edge set has no half-edges — fail loudly, as the old
        // driver-side require did, instead of emitting a NULL-filled row
        when(col("__m2").isNull, raise_error(lit("modularity needs at least one edge"))
          .cast("long"))
          .otherwise(expr("__m2 div 2")).cast("long").as("m_edges"),
        // Σ_c (4m·in_c − deg_c²) = m2·Σin2_c − Σdeg_c² (4m·in_c = m2·in2_c)
        (col("__m2").cast(dec) * col("__in2_sum") - col("__deg2_sum"))
          .cast("long").as("q_x4m2"))
  }
}
