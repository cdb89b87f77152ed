package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for dataset curation.
  *
  * Training-data pipelines need REPRODUCIBLE sampling: the same document
  * must land in the same split on every run, on any engine, regardless of
  * partitioning — which rules out `df.sample()` (RNG per partition, order-
  * and partitioning-sensitive). The standard production answer is hash
  * sampling: a document is selected iff a deterministic hash of its id
  * lands under the rate cutoff. Selection is then a pure per-row predicate
  * (narrow, codegen'd, pushes down like any filter) and any engine can
  * recompute the exact same sample.
  *
  * The hash is Knuth's multiplicative scheme over the 32-bit ring:
  * `h(id) = (id * 2654435761) mod 2^32`. All comparisons are pure integer
  * arithmetic (no floats, no RNG), so plain SQL — the DuckDB oracle, a
  * warehouse, a Python check script — reproduces membership bit-for-bit.
  *
  * The multiply is SPLIT (hi/lo 16-bit halves of the constant, each
  * product reduced mod 2^32 before recombining) so no intermediate
  * exceeds ~2^49: under Spark's ANSI mode a plain `id * 2654435761`
  * THROWS on Long overflow once ids pass ~3.4e9 — ids real 100-TB
  * corpora reach, and exactly where the 100× ScaleCheck run caught it
  * (wrap-on-overflow would have been algebraically correct mod 2^32,
  * but ANSI never wraps). The split form is identical to
  * `(id::HUGEINT * 2654435761) % 2^32` for every non-negative id, so
  * every oracle keeps the one-line HUGEINT formula.
  */
object Sampling {

  private val KnuthHi = 40503L // 0x9E37
  private val KnuthLo = 31153L // 0x79B1; hi*2^16 + lo = 2654435761
  private val Ring = 4294967296L // 2^32

  /** The 32-bit multiplicative hash of a non-negative integer id. */
  def idHash(id: Column): Column = {
    val k32 = pmod(id.cast("long"), lit(Ring))
    pmod(pmod(k32 * KnuthHi, lit(Ring)) * 65536L + k32 * KnuthLo, lit(Ring))
  }

  /** Integer cutoff under which a hash is "in" an `fractionBp`-basis-point
    * sample. Exposed so callers (and oracles) can inline the constant. */
  def cutoff(fractionBp: Int): Long = {
    require(fractionBp >= 0 && fractionBp <= 10000, "fraction is in basis points [0, 10000]")
    fractionBp * Ring / 10000
  }

  /** Keep rows whose id hashes under `fractionBp` basis points (1% = 100).
    * A row's membership is stable across runs, engines and partitionings;
    * nested fractions are subsets (a 1% sample is inside the 5% sample). */
  def hashSample(df: DataFrame, idCol: String, fractionBp: Int): DataFrame =
    df.where(idHash(col(s"`$idCol`")) < cutoff(fractionBp))

  /** Temperature-scaled mixture cutoffs — the standard multi-source
    * rebalancing for LLM corpora (sampling weight ∝ n^(1/T), so T>1 boosts
    * small sources against dominant ones; T=1 is proportional, T=∞ uniform).
    * Given per-stratum counts, returns the integer hash cutoff per stratum
    * for an overall `targetFraction` of the corpus.
    *
    * Rates go through doubles (`pow`), so cross-engine equality is secured
    * by snapping each rate to a 1/4096 grid BEFORE scaling to the 2^32
    * ring: a 1-ULP `pow`/summation difference cannot move a cutoff, and
    * membership stays a pure integer compare any engine reproduces. */
  def temperatureMixCutoffs(counts: Map[String, Long], temperature: Double,
                            targetFraction: Double): Map[String, Long] = {
    require(temperature >= 1.0, "temperature >= 1 (1 = proportional sampling)")
    require(targetFraction > 0.0 && targetFraction <= 1.0, "target fraction in (0, 1]")
    val alpha = 1.0 / temperature
    val sources = counts.keys.toSeq.sorted // fixed fold order
    val w = sources.map(s => math.pow(counts(s).toDouble, alpha))
    val wSum = w.sum
    val total = counts.values.sum
    val k = math.floor(targetFraction * total)
    sources.zip(w).map { case (s, ws) =>
      val rate = math.min(1.0, k * (ws / wSum) / counts(s))
      s -> math.min(4096L, math.floor(rate * 4096).toLong) * (1L << 20)
    }.toMap
  }

  /** Sample `df` with temperature-mixed per-stratum rates. Counts are one
    * small aggregate (strata cardinality rows); membership is the same
    * narrow codegen'd integer filter as [[hashSample]]. */
  def temperatureMixSample(df: DataFrame, strataCol: String, idCol: String,
                           temperature: Double, targetFraction: Double): DataFrame = {
    // null strata are dropped, mirroring stratifiedHashSample's unlisted-
    // stratum semantics (a null key would otherwise NPE the sorted fold).
    // The strata column is CAST to string up front so an int/long/date
    // stratum works too (getString would ClassCastException otherwise,
    // advisor r7) - and the CASE chain compares against the same cast,
    // keeping Spark and any re-implementing engine keyed on identical
    // string images.
    val strata = col(s"`$strataCol`").cast("string")
    val counts = df.where(strata.isNotNull)
      .groupBy(strata.as("__stratum")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cutoffs = temperatureMixCutoffs(counts, temperature, targetFraction)
    val cut = cutoffs.toSeq.sortBy(_._1).foldLeft(lit(0L)) { case (acc, (stratum, c)) =>
      when(strata === stratum, c).otherwise(acc)
    }
    df.where(idHash(col(s"`$idCol`")) < cut)
  }

  /** Exactly `min(k, |stratum|)` rows per stratum, deterministically:
    * rows rank inside their stratum by the portable id hash (the Knuth
    * multiply is a bijection below 2^32, and the id is the final tiebreak
    * regardless), and the first k win. Unlike rate-based [[hashSample]],
    * the output size is EXACT — the shape eval sets and per-source probes
    * need ("give me 1000 docs from every source, same ones every run").
    *
    * Scale shape: the ranking runs over a narrow (stratum, id, hash)
    * projection — one shuffle of ~20 bytes/row, never document bodies —
    * and the winners re-attach by a broadcast semi-join (k × |strata| rows
    * is driver-small by construction; callers with millions of strata
    * should drop to a plain semi-join). No global sort anywhere. */
  def fixedKPerStratum(df: DataFrame, strataCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val keys = df.select(col(s"`$strataCol`").as("__stratum"),
      col(s"`$idCol`").as("__id"))
      .withColumn("__h", idHash(col("__id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__stratum")).orderBy(col("__h"), col("__id"))
    val picked = keys.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).select(col("__stratum"), col("__id"))
    // re-attach on (stratum, id), not id alone: ids unique only per source
    // (per-source sequence numbers) would otherwise admit a SAME-ID loser
    // row from a different stratum and break the exactly-min(k,n) contract
    df.join(broadcast(picked),
      col(s"`$idCol`") === picked("__id") &&
        col(s"`$strataCol`") <=> picked("__stratum"), "left_semi")
  }

  /** Multi-epoch curriculum mixing: one pass over the corpus emits
    * `(row, epoch)` for every epoch whose temperature-scaled cutoffs admit
    * the row — the training schedule where early epochs sample
    * proportionally and later epochs flatten toward uniform (or any
    * schedule of `(epoch, temperature, targetFraction)`).
    *
    * Scale shape: per-stratum counts are collected ONCE (strata-cardinality
    * rows); each epoch's membership is the same pure integer hash compare
    * as [[hashSample]], evaluated per row against a per-epoch CASE chain,
    * and a row explodes only into the epochs that admit it — ONE corpus
    * scan for the whole schedule, no unions, no joins, no re-scans. */
  def curriculumMix(df: DataFrame, strataCol: String, idCol: String,
      schedule: Seq[(Int, Double, Double)]): DataFrame = {
    require(schedule.nonEmpty, "schedule must be non-empty")
    require(schedule.map(_._1).distinct.size == schedule.size, "epochs must be distinct")
    val strata = col(s"`$strataCol`").cast("string")
    val counts = df.where(strata.isNotNull)
      .groupBy(strata.as("__stratum")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val admitted = array(schedule.map { case (epoch, temperature, frac) =>
      val cutoffs = temperatureMixCutoffs(counts, temperature, frac)
      val cut = cutoffs.toSeq.sortBy(_._1).foldLeft(lit(0L)) { case (acc, (st, c)) =>
        when(strata === st, c).otherwise(acc)
      }
      when(idHash(col(s"`$idCol`")) < cut, lit(epoch)).otherwise(lit(null).cast("int"))
    }: _*)
    df.withColumn("epoch", explode(filter(admitted, x => x.isNotNull)))
  }

  /** Data-mixture plan: given a per-row token count and a TARGET share per
    * group (parts-per-million, the published-mixture shape — e.g. The Pile /
    * Dolma report per-source percentages), compute what it takes to hit the
    * target from this corpus under a total token budget: per group the
    * observed tokens, observed share, sampling weight (target ÷ observed
    * share — >1e6 means up-sample/repeat, <1e6 means down-sample), the
    * token allotment under the budget, and the epoch count over the group's
    * data that allotment implies (x100). Groups absent from the target map
    * get weight 0 (curation semantics: an unlisted source is excluded).
    *
    * Scale shape: ONE aggregate keyed on the group (map-side partials over
    * the narrow (group, tokens) projection — document bodies never move),
    * then a broadcast of the single-row grand total onto group-cardinality
    * rows. No windows, no driver collect. Budget arithmetic is integer
    * (`div`); shares/weights are double-computed but pinned by round() at
    * fixed scale, which both engines replay identically.
    */
  def mixturePlan(df: DataFrame, groupCol: String, tokensCol: String,
                  targetPpm: Map[String, Long], budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    require(targetPpm.values.forall(_ >= 0), "target shares must be >= 0")
    val g = col(s"`$groupCol`").cast("string")
    val counts = df.where(g.isNotNull)
      .groupBy(g.as("group"))
      .agg(sum(col(s"`$tokensCol`").cast("long")).as("tokens"))
    val total = counts.agg(sum(col("tokens")).as("__total"))
    val target = targetPpm.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (grp, ppm)) => when(col("group") === grp, ppm).otherwise(acc)
    }
    counts.crossJoin(broadcast(total))
      .withColumn("target_ppm", target)
      .select(
        col("group"),
        col("tokens"),
        round(col("tokens").cast("double") * 1000000d / col("__total"))
          .cast("long").as("actual_ppm"),
        col("target_ppm"),
        round(col("target_ppm").cast("double") * col("__total") /
          greatest(col("tokens"), lit(1L))).cast("long").as("weight_x1e6"),
        // decimal(38,0) intermediate: ppm × a realistic LLM budget (15e12
        // tokens at 70% share = 1.05e19) overflows Long and would plan a
        // NEGATIVE token count; DuckDB computes this in 128-bit hugeint,
        // so the decimal path also keeps oracle arithmetic identical
        expr(s"cast((cast(target_ppm AS DECIMAL(38,0)) * ${budgetTokens}L) div 1000000 AS BIGINT)")
          .as("planned_tokens"),
        round(expr(s"cast((cast(target_ppm AS DECIMAL(38,0)) * ${budgetTokens}L) div 1000000 AS BIGINT)")
          .cast("double") * 100d / greatest(col("tokens"), lit(1L))).cast("long").as("epochs_x100"))
  }

  /** Stratified hash sampling: per-stratum basis-point rates, default 0
    * (strata absent from the map are dropped — curation semantics: an
    * unlisted source does not leak into the mix). The rate lookup compiles
    * to a CASE chain, so the whole operator stays one narrow codegen'd
    * filter — no join, no shuffle, safe at any scale. For thousands of
    * strata, broadcast-join a rates table instead. */
  def stratifiedHashSample(df: DataFrame, strataCol: String, idCol: String,
                           fractionsBp: Map[String, Int]): DataFrame = {
    val cut = fractionsBp.foldLeft(lit(0L)) { case (acc, (stratum, bp)) =>
      when(col(s"`$strataCol`") === stratum, cutoff(bp)).otherwise(acc)
    }
    df.where(idHash(col(s"`$idCol`")) < cut)
  }

  /** Weighted sampling WITHOUT replacement, k per group (Efraimidis–
    * Spirakis A-ES): every row draws `u` in (0,1) from the engine-portable
    * integer [[idHash]] of its id and competes with key `u^(1/w)`; the k
    * largest keys per group are the sample. Inclusion probability tracks
    * the weight, nothing is drawn twice, and the whole draw is a pure
    * function of (id, weight) — rerunnable on any engine, any
    * partitioning. Quality-weighted subsampling (weight = a quality score)
    * is the canonical use.
    *
    * Scale shape: key is a narrow codegen'd projection; selection is the
    * bounded-heap [[graft.plans.TopKAggregate]] — partial aggregation
    * map-side, the shuffle carries at most k rows per group per input
    * partition, nothing sorts. The window-rank formulation this replaces
    * shuffles and sorts every row of the corpus.
    *
    * Cross-engine determinism: `u` is exact in both engines (integer hash
    * + power-of-two divide); the only float op is `pow`, so the key is
    * snapped to a 2^20 grid with ties broken by id ASC — a sub-ULP `pow`
    * divergence cannot reorder the sample. Rows with non-positive or null
    * weight never enter the draw.
    *
    * Returns `(groupCol, id, rank)`, rank 1..k by (key DESC, id ASC). */
  def weightedSampleK(df: DataFrame, groupCol: String, idCol: String,
                      weightCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = col(s"`$weightCol`").cast("double")
    val u = (idHash(col(s"`$idCol`")) + lit(0.5)) / lit(Ring.toDouble)
    val key = floor(pow(u, lit(1.0) / w) * (1L << 20)).cast("double")
    df.where(w > 0)
      .groupBy(col(s"`$groupCol`"))
      .agg(graft.plans.TopKAggregate.topKByScore(
        key, col(s"`$idCol`").cast("long"), k).as("__sel"))
      .select(col(s"`$groupCol`"), posexplode(col("__sel")).as(Seq("__r", "__s")))
      .select(col(s"`$groupCol`"), col("__s.id").as("id"),
        (col("__r") + 1).cast("long").as("rank"))
  }
}
