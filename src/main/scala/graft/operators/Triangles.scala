package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an edge table — the third graph analytic next to
  * [[Dedup.connectedComponents]] and [[PageRank]], for link-graph curation
  * (clustering coefficient separates organic link neighborhoods from
  * link-farm spam; triangle-dense near-dup graphs flag template families).
  *
  * The join is ORIENTED before any expansion: every undirected edge is
  * normalized to (lo, hi) with lo < hi and deduplicated, so each triangle
  * {a<b<c} is constructed exactly once as the wedge a→b→c closed by the
  * oriented edge (a, c) — no ×6 symmetric blowup, no post-hoc distinct
  * over a combinatorial intermediate.
  *
  * Scale shape: wedge building self-joins the oriented edge list on the
  * middle vertex (one hash shuffle each side); the closing check is a
  * second equi-join back to the same list on (a, c). Wedge volume is
  * Σ_v out(v)², the standard triangle-counting cost — bounded for the
  * id-ordered orientation by the corpus's degree skew. `maxWedgeDegree`
  * is the loud guard: a hub whose oriented out-degree exceeds it fails
  * the job before the wedge explosion schedules (same contract as the
  * SemDeDup/gap-fill guards — data-quality failure, not a tuning knob);
  * raise it deliberately for genuinely dense graphs.
  *
  * Output (one row): n_edges (oriented, deduped), n_wedges (ORDERED
  * wedges a<b<c with both edges present — each triangle closes exactly
  * one of them, so n_triangles/n_wedges is the ordered-wedge closure
  * rate; note this denominator is NOT the conventional Σ d(d−1)/2
  * transitivity denominator), n_triangles. Self-loops and NULL endpoints
  * are dropped (no triangle contains one). The integers are exact;
  * quotients are left to the caller.
  */
object Triangles {

  def report(edges: DataFrame, maxWedgeDegree: Int = 100000): DataFrame = {
    val e = Partitioning.spread(edges.select(
      col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .distinct()

    // oriented out-degree guard rides a broadcast-sized aggregate as a
    // FILTER (cannot be pruned away); a hub past the cap raises loudly
    val deg = e.groupBy(col("lo")).agg(count(lit(1)).as("__deg"))
    val guarded = e.join(broadcast(deg), Seq("lo"))
      .where(when(col("__deg") > maxWedgeDegree,
        raise_error(concat(lit(s"triangle wedge degree over $maxWedgeDegree at node "),
          col("lo").cast("string"))).cast("boolean")).otherwise(lit(true)))
      .drop("__deg")
      .localCheckpoint(eager = false) // three consumers; don't re-derive

    val wedges = guarded.select(col("lo").as("a"), col("hi").as("b"))
      .join(guarded.select(col("lo").as("b"), col("hi").as("c")), Seq("b"))
    val closed = wedges.join(
      guarded.select(col("lo").as("a"), col("hi").as("c")), Seq("a", "c"), "left_semi")

    guarded.agg(count(lit(1)).as("n_edges"))
      .crossJoin(wedges.agg(count(lit(1)).as("n_wedges")))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }
}
