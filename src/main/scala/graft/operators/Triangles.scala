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
  * Σ_v in(v)·out(v) over the orientation — bounded by degree skew.
  * `maxWedgeDegree` is the loud guard on TOTAL degree (in + out: the
  * product term is what explodes, and either factor can carry it): any
  * node past the cap fails the job before the wedge join schedules
  * (same contract as the SemDeDup/gap-fill guards — a data-quality
  * failure, not a tuning knob); raise it deliberately for genuinely
  * dense graphs.
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

    // degree guard as a FILTER (cannot be pruned away): wedge volume
    // through a middle node b is in(b)·out(b) ≤ deg(b)², so the cap must
    // bound TOTAL degree on BOTH endpoints — an out-degree-only check
    // would wave through a high-IN-degree hub and schedule the very
    // explosion it promises to prevent. The degree table is O(V) rows —
    // never broadcast it (a hint would drag a billion-node table through
    // the driver); both probes are plain equi-joins, co-partitioned with
    // the degree aggregate on the first and one extra edge shuffle on the
    // second — the price of a guard that cannot be skipped.
    val deg = e.select(col("lo").as("node")).unionAll(e.select(col("hi").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("__deg"))
    def guardSide(in: DataFrame, side: String): DataFrame =
      in.join(deg, in(s"`$side`") === deg("node"))
        .where(when(col("__deg") > maxWedgeDegree,
          raise_error(concat(lit(s"triangle wedge degree over $maxWedgeDegree at node "),
            col("node").cast("string"))).cast("boolean")).otherwise(lit(true)))
        .drop("node", "__deg")
    val guarded = guardSide(guardSide(e, "lo"), "hi")
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
