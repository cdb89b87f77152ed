package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star rounds
  * (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii 2014, "Connected
  * Components in MapReduce and Beyond", SoCC) — the DEEP-graph complement
  * to [[Dedup.connectedComponents]]'s min-label propagation.
  *
  * Min-label propagation moves a component's minimum one hop per round:
  * O(diameter) rounds, each a cheap frontier join — ideal for near-dup
  * graphs (tiny diameter by construction) and WRONG for a path-shaped
  * duplicate chain, where diameter-50 exceeds its round budget and the
  * operator (correctly, loudly) throws. Star contraction instead rewires
  * the edge set itself toward stars around per-neighborhood minima:
  *
  *   large-star: every node u points its LARGER neighbors at
  *     m = min(Γ⁺(u)); small-star: u points its smaller-or-equal
  *     neighbors (and itself) at m.
  *
  * Alternating the two converges in O(log² n) rounds regardless of
  * diameter (the paper's Theorem 3; observed ≤ ~8 on diameter-50 chains)
  * to a forest of stars whose centers are the component minima — the
  * same labels min-label CC produces, asserted equivalent in CcStarSpec.
  *
  * Scale shape per round: one symmetrize (in-row explode), one
  * per-node min aggregate (map-side combined), one join of the edge set
  * against that min table, one distinct — all shuffles EDGE-set-sized,
  * never pair-quadratic; the edge set only shrinks or stays (edges point
  * at minima, duplicates collapse in the distinct). Lineage is truncated
  * per round (localCheckpoint, same rationale as min-label CC's).
  *
  * Convergence is verified, not assumed: the loop stops when a full
  * round leaves the edge multiset unchanged (count + anti-join — an
  * edge-sized probe riding edge-sized rounds), and the final labeling is
  * VALIDATED against the original pairs (every input edge must connect
  * identically-labeled nodes, every label must be its component's
  * minimum id) — a truncated or buggy contraction throws, it never
  * returns a silently split component. */
object CcStar {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** (id, component) labels for every node appearing in `pairs`
    * (columns id_a, id_b), component = the component's minimum id.
    *
    * @param reliableCheckpoint same contract as
    *        [[Dedup.connectedComponents]]: truncate per-round lineage with
    *        `checkpoint(true)` against `sparkContext.getCheckpointDir`
    *        instead of `localCheckpoint`. Local blocks die with their
    *        executor — fine single-process, but on a real cluster one lost
    *        executor aborts the whole contraction.
    * @param validate run the three post-convergence labeling checks (no
    *        split edges, one label per node, labels are component minima).
    *        Fail-loud is the DEFAULT — a wrong labeling throws, never
    *        returns — but the checks cost three extra edge/label-sized
    *        joins+aggregates after convergence (~2× the post-convergence
    *        wall at 100 TB edges, SCALING.md cc_star_validate row); a
    *        caller who has just validated the same pipeline may opt out,
    *        mirroring how `reliableCheckpoint` is opt-in (verdict r13
    *        ask #5). Labels are identical either way — the flag skips
    *        verification, never changes the computation (asserted in
    *        CcStarSpec). */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 30,
                              reliableCheckpoint: Boolean = false,
                              validate: Boolean = true): DataFrame = {
    val spark = pairs.sparkSession
    if (reliableCheckpoint) require(spark.sparkContext.getCheckpointDir.isDefined,
      "reliableCheckpoint=true needs sparkContext.setCheckpointDir(...) first")
    def truncate(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(true) else df.localCheckpoint(true)

    def sym(e: DataFrame): DataFrame =
      e.select(explode(array(
        struct(col("u").as("s"), col("v").as("t")),
        struct(col("v").as("s"), col("u").as("t")))).as("p"))
        .select(col("p.s").as("u"), col("p.t").as("v"))

    // m(u) = min(Γ⁺(u)) over the symmetrized current edge set
    def minsOf(symE: DataFrame): DataFrame =
      symE.groupBy(col("u")).agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("m"))

    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      s.where(col("v") > col("u")).join(minsOf(s), Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val mins = minsOf(s)
      val smaller = s.where(col("v") < col("u")).join(mins, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
      val self = mins.select(col("u"), col("m").as("v"))
      smaller.unionByName(self).where(col("u") =!= col("v")).distinct()
    }

    var e = truncate(pairs
      .select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct())
    var iter = 0
    var converged = false
    var nCur = e.count()
    // the round's edge count RIDES the checkpoint materialization as a
    // CollectMetrics observation (the Convergence.Latched pattern shared
    // with min-label CC / LPA) — a separate count() job per round doubled
    // the driver's per-round job count for a number the checkpoint job
    // already knows
    val conv = new Convergence.Latched(spark, "ccstar")
    while (!converged && iter < maxIter) {
      val t0 = System.nanoTime()
      val (next, nNext) = conv.observedRound(
        obsName => truncate(smallStar(largeStar(e))
          .observe(obsName, count(lit(1)).as("n_edges"))),
        df => df.count())
      // unchanged SET <=> equal counts and no new edge (both frames are
      // post-distinct sets, so one anti-join direction suffices)
      val nNew = next.join(e, Seq("u", "v"), "left_anti").count()
      converged = nNew == 0 && nNext == nCur
      log.info(s"graft.ccstar round=$iter edges=$nNext newEdges=$nNew " +
        s"ms=${(System.nanoTime() - t0) / 1000000}")
      e = next
      nCur = nNext
      iter += 1
    }
    log.info(s"graft.ccstar converged=$converged rounds=$iter")
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge within $maxIter rounds — " +
        "star contraction is O(log^2 n); hitting this bound means the edge " +
        "set is not shrinking (inspect graft.ccstar round logs)")

    // converged edge set is a star forest (u -> center); centers label
    // themselves
    val labelsLazy = e.select(col("u").as("id"), col("v").as("component"))
      .unionByName(e.select(col("v").as("id"), col("v").as("component")))
      .distinct()

    // ---- validation: a wrong labeling must THROW, never return ----
    if (!validate) return labelsLazy
    // the label frame feeds all three checks AND the caller — materialize
    // it once instead of replaying the union+distinct per consumer
    val labels = labelsLazy.localCheckpoint(eager = false)
    // the three checks are independent counts over node/edge-sized frames;
    // collecting them as ONE 1-row action (instead of three count() jobs)
    // pays one driver round-trip for all three — same protocol the checks
    // had, same throw-on-violation semantics, checked in original order
    val la = labels.select(col("id").as("id_a"), col("component").as("__ca"))
    val lb = labels.select(col("id").as("id_b"), col("component").as("__cb"))
    // (1) every original edge connects identically-labeled nodes (a split
    // component fails here even if each side looks star-shaped)
    val splitF = pairs.select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
      .where(col("id_a") =!= col("id_b"))
      .join(la, Seq("id_a")).join(lb, Seq("id_b"))
      .where(col("__ca") =!= col("__cb"))
      .agg(count(lit(1)).as("__split"))
    // (2) every node carries exactly ONE label (a node attached to two
    // centers would survive check 1 if the centers merged elsewhere)
    val multiF = labels.groupBy(col("id")).agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1).agg(count(lit(1)).as("__multi"))
    // (3) every label is its component's minimum member id
    val badMinF = labels.groupBy(col("component")).agg(min(col("id")).as("__mn"))
      .where(col("__mn") =!= col("component")).agg(count(lit(1)).as("__badmin"))
    val checks = splitF.crossJoin(multiF).crossJoin(badMinF).collect()(0)
    val (split, multi, badMin) = (checks.getLong(0), checks.getLong(1), checks.getLong(2))
    if (split > 0) throw new IllegalStateException(
      s"connectedComponentsStar produced a split labeling: $split input " +
        "edges straddle two components")
    if (multi > 0) throw new IllegalStateException(
      s"connectedComponentsStar labeled $multi nodes more than once")
    if (badMin > 0) throw new IllegalStateException(
      s"connectedComponentsStar labels are not component minima in $badMin components")
    labels
  }

  /** Incremental connected components (r15): merge a batch of NEW edges
    * into a stored (id, component) labeling WITHOUT re-running CC over
    * the corpus edge set — the graph family's incremental member, the
    * band-index / IVF-store pattern applied to component labels (the
    * table a live dedup deployment maintains).
    *
    * Correctness leans on the invariant both CC operators here produce
    * and VALIDATE: a stored label is its component's minimum member id.
    * Then (a) new-edge endpoints map to their stored supernodes — one
    * batch-sized join against the label store; an unseen id is its own
    * supernode, which is how brand-new nodes enter — (b) star-contraction
    * CC runs over the supernode graph those edges induce (≤ 2·|batch|
    * nodes; contraction, so a batch that chains MANY old components
    * still converges in O(log²) rounds), and (c) the store is rewritten
    * through a BROADCAST remap of the touched components only — the
    * label store itself never shuffles, it streams through one narrow
    * join. Supernode labels are old minima or new ids, so the merged
    * minimum IS the global minimum: the result equals a full CC over
    * (stored ∪ new) edges exactly (shared oracle + spec law).
    *
    * Batch premise: the remap is touched-component-sized and broadcast;
    * a caller merging corpus-scale edge sets should run
    * [[connectedComponentsStar]] over the union instead. */
  def incrementalComponents(labels: DataFrame, newEdges: DataFrame,
                            maxIter: Int = 30, validate: Boolean = true): DataFrame = {
    val l = labels.select(col("id").cast("long").as("id"),
      col("component").cast("long").as("component"))
    val e = newEdges.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"))
      .where(col("id_a").isNotNull && col("id_b").isNotNull)
    val la = l.select(col("id").as("id_a"), col("component").as("__ca"))
    val lb = l.select(col("id").as("id_b"), col("component").as("__cb"))
    val mapped = e.join(la, Seq("id_a"), "left").join(lb, Seq("id_b"), "left")
      .select(coalesce(col("__ca"), col("id_a")).as("id_a"),
        coalesce(col("__cb"), col("id_b")).as("id_b"))
      // an edge inside one stored component (or a self edge) carries no
      // new connectivity; it cannot hide a NEW node, because a new id
      // equalling its partner's component label would equal an EXISTING
      // node id (labels are member ids) — contradicting "new"
      .where(col("id_a") =!= col("id_b"))
    val merged = connectedComponentsStar(mapped, maxIter, validate = validate)
    val remap = merged.select(col("id").as("component"), col("component").as("__nc"))
    val rewritten = l.join(broadcast(remap), Seq("component"), "left")
      .select(col("id"), coalesce(col("__nc"), col("component")).as("component"))
    val newNodes = merged.join(l.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("component"))
    rewritten.unionByName(newNodes)
  }
}
