package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory frequency and cardinality sketches — Count-Min
  * (Cormode & Muthukrishnan 2005, J. Algorithms 55) and HyperLogLog
  * (Flajolet, Fusy, Gandouet & Meunier 2007, AofA) — built as plain
  * map-side-combined aggregates over md5-derived hash slices, so both
  * engines replay every cell and register EXACTLY (the same
  * hex-slice-to-integer trick as the winnowing fingerprints; no
  * engine-private hash like xxhash64 anywhere near the oracle).
  *
  * Why these exist at 100 TB: exact per-key counts and exact distincts
  * shuffle key-cardinality-sized state; the sketches shuffle a CONSTANT
  * — depth×width cells (CMS) or m registers (HLL) per map partition —
  * regardless of corpus or vocabulary size. Spark's own
  * `approx_count_distinct` is the same HLL idea but its register layout
  * is engine-private; this one is portable by construction.
  *
  * Hash layout (one md5 per key, disjoint hex slices):
  *   - CMS row r (r < depth ≤ 10): column = hex[3r+1 .. 3r+3] as int
  *     mod width — 12 bits reduced to `width`; uniform iff width
  *     divides 4096 (require'd).
  *   - HLL: bucket = hex[1..3] mod m (m | 4096, require'd); rank
  *     source = hex[4..18] as a 60-bit integer v, rho = 61−bitlen(v)
  *     (61 when v = 0) — the leading-zero count in a fixed 60-bit
  *     window, computed as `length(bin(v))` which both engines define
  *     identically (minimal binary string).
  */
object Sketches {

  private def hexSlice(key: Column, start: Int, len: Int): Column =
    conv(substring(md5(key), start, len), 16, 10).cast("long")

  /** Count-Min cell table: (r, c, cnt), at most depth×width rows out of
    * one map-side-combined aggregate over ONE scan of `keys` (the
    * depth-way fan-out is an in-row explode, not a union of re-scans —
    * review r12 finding: the union form re-ran the whole upstream
    * token pipeline `depth` times). `keys` may repeat (one row per
    * occurrence). The (depth, width) parameters ride the `r` column's
    * metadata so [[cmsEstimates]] can reject a mismatched probe. */
  def cmsAggregate(keys: DataFrame, keyCol: String,
                   depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 10, "depth in [1, 10] — md5 has 10 disjoint 3-hex slices")
    require(width >= 2 && 4096 % width == 0,
      s"width must divide 4096 for a uniform 12-bit reduction, got $width")
    val k = col(s"`$keyCol`")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.cms.depth", depth).putLong("graft.cms.width", width).build()
    keys.where(k.isNotNull)
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), (hexSlice(k, 1 + 3 * r, 3) % width).as("c"))): _*)).as("p"))
      .groupBy(col("p.r").as("r", meta), col("p.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-GROUP Count-Min cell table: (group, r, c, cnt) — per-group
    * frequency sketches ("how often does this token appear per language /
    * per source") without a vocabulary-keyed shuffle per group: the
    * aggregate combines map-side, so the exchange carries at most
    * groups × depth × width cell rows per map partition, a constant per
    * group regardless of the group's row count. The per-group sibling of
    * [[cmsAggregate]], mirroring [[hllGroupRegisters]]'s register
    * discipline; merging two corpora's group-cell tables is per-(group,
    * r, c) SUM (counts are additive), where HLL registers merge by max. */
  def cmsGroupAggregate(keys: DataFrame, groupCol: String, keyCol: String,
                        depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 10, "depth in [1, 10] — md5 has 10 disjoint 3-hex slices")
    require(width >= 2 && 4096 % width == 0,
      s"width must divide 4096 for a uniform 12-bit reduction, got $width")
    val g = col(s"`$groupCol`")
    val k = col(s"`$keyCol`")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.cms.depth", depth).putLong("graft.cms.width", width).build()
    keys.where(k.isNotNull && g.isNotNull)
      .select(g.as(groupCol), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), (hexSlice(k, 1 + 3 * r, 3) % width).as("c"))): _*)).as("p"))
      .groupBy(g, col("p.r").as("r", meta), col("p.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group point estimates: (group, key, est) with est = min over the
    * key's depth cells WITHIN its group — the same CMS upper bound as
    * [[cmsEstimates]], per group. `probes` carries (groupCol, keyCol)
    * rows (a key may be probed under several groups). The group-cell
    * table is ≤ groups × depth × width rows — broadcast it; probes
    * stream. */
  def cmsGroupEstimates(cells: DataFrame, probes: DataFrame,
                        groupCol: String, keyCol: String,
                        depth: Int = 4, width: Int = 1024): DataFrame = {
    val rMeta = cells.schema.find(_.name == "r").map(_.metadata)
    rMeta.filter(_.contains("graft.cms.depth")).foreach { m =>
      require(m.getLong("graft.cms.depth") == depth && m.getLong("graft.cms.width") == width,
        s"cells were built with depth=${m.getLong("graft.cms.depth")}, " +
          s"width=${m.getLong("graft.cms.width")} but the probe asks for ($depth, $width)")
    }
    val g = col(s"`$groupCol`")
    val k = col(s"`$keyCol`")
    val probeCells = probes.where(k.isNotNull && g.isNotNull).select(
        g.as(groupCol), k.as("__key"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"), (hexSlice(k, 1 + 3 * r, 3) % width).as("c"))): _*)).as("p"))
      .select(col(s"`$groupCol`"), col("__key"), col("p.r").as("r"), col("p.c").as("c"))
    probeCells.join(broadcast(cells), Seq(groupCol, "r", "c"), "left_outer")
      .groupBy(col(s"`$groupCol`"), col("__key").as(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Re-stamp the (depth, width) parameter metadata on a CMS cell table
    * read back from storage. A plain Spark parquet write happens to keep
    * column metadata (Spark's own schema, stamp included, rides the
    * footer) — but that protection is engine-private and layout-fragile:
    * a column that becomes a PARTITION directory is rebuilt from path
    * names with no metadata, and any non-Spark writer/rewriter of the
    * store drops the Spark schema entirely. A reloaded cell table can
    * therefore arrive WITHOUT the parameter stamp [[cmsEstimates]]'s
    * guard checks — silently degrading the probe-mismatch protection to
    * nothing. The sketch-store contract is: write cells with any sink,
    * re-stamp ON READ with the parameters the store's path/registry says
    * the sketch was built with. The caller asserts those parameters out
    * of band (directory naming, a params sidecar, a table property); this
    * helper only re-attaches them so every downstream probe is guarded
    * again. Round-trip pinned by `sketch_store_roundtrip`; the dropping
    * case pinned in SketchesSpec. */
  def stampCms(cells: DataFrame, depth: Int, width: Int): DataFrame = {
    require(cells.columns.contains("r") && cells.columns.contains("c") &&
      cells.columns.contains("cnt"), "expected a CMS cell table (r, c, cnt)")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.cms.depth", depth).putLong("graft.cms.width", width).build()
    cells.select(col("r").cast("int").as("r", meta), col("c").cast("long").as("c"),
      col("cnt").cast("long").as("cnt"))
  }

  /** Point estimates for `probes` (distinct keys, one column `keyCol`):
    * (key, est) where est = min over rows of the key's cell — the CMS
    * upper bound, est >= true count always, with the classic (eps,
    * delta) overestimate guarantee. The cell table is depth×width rows,
    * so it broadcasts; probes stream. */
  def cmsEstimates(cells: DataFrame, probes: DataFrame, keyCol: String,
                   depth: Int = 4, width: Int = 1024): DataFrame = {
    // a probe against cells built with different (depth, width) silently
    // reads wrong/empty cells and can UNDERestimate — the one way a CMS
    // breaks its upper-bound contract. The build stamps its parameters on
    // the `r` column; a cells frame carrying the stamp must match.
    val rMeta = cells.schema.find(_.name == "r").map(_.metadata)
    rMeta.filter(_.contains("graft.cms.depth")).foreach { m =>
      require(m.getLong("graft.cms.depth") == depth && m.getLong("graft.cms.width") == width,
        s"cells were built with depth=${m.getLong("graft.cms.depth")}, " +
          s"width=${m.getLong("graft.cms.width")} but the probe asks for ($depth, $width)")
    }
    val k = col(s"`$keyCol`")
    val probeCells = probes.where(k.isNotNull).select(
        k.as("__key"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"), (hexSlice(k, 1 + 3 * r, 3) % width).as("c"))): _*)).as("p"))
      .select(col("__key"), col("p.r").as("r"), col("p.c").as("c"))
    // empty cell = zero occurrences hashed there: the min must see 0,
    // not skip the row — hence the left join + coalesce
    probeCells.join(broadcast(cells), Seq("r", "c"), "left_outer")
      .groupBy(col("__key").as(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Equi-join SIZE estimate from two CMS cell tables (the CMS inner
    * product — Cormode & Muthukrishnan 2005 §4.2, the AGMS idea on CMS
    * state): |A ⋈ B| = Σ_k a_k·b_k is estimated per row r by
    * Σ_c cntA(r,c)·cntB(r,c) and the rows combine by MIN. Every row's
    * inner product ≥ the true join size (colliding keys only ADD
    * cross-terms), so the estimate keeps the CMS upper-bound contract,
    * with the classic ε·N_A·N_B overestimate guarantee.
    *
    * Why this exists at 100 TB: sizing a join BEFORE running it (choose
    * broadcast vs shuffle, pre-provision skew handling) from two
    * constant-size sketches that each cost one scan — and that were
    * likely already persisted by the daily sketch store. The estimate
    * itself joins depth×width rows against depth×width rows: driver-cheap
    * at any corpus size. Both inputs must be [[cmsAggregate]] outputs
    * with the SAME (depth, width) — the params-stamp guard applies. */
  def cmsJoinSizeEstimate(cellsA: DataFrame, cellsB: DataFrame,
                          depth: Int = 4, width: Int = 1024): DataFrame = {
    Seq(cellsA, cellsB).foreach { cells =>
      val rMeta = cells.schema.find(_.name == "r").map(_.metadata)
      rMeta.filter(_.contains("graft.cms.depth")).foreach { m =>
        require(m.getLong("graft.cms.depth") == depth && m.getLong("graft.cms.width") == width,
          s"cells were built with depth=${m.getLong("graft.cms.depth")}, " +
            s"width=${m.getLong("graft.cms.width")} but the estimate asks for ($depth, $width)")
      }
    }
    val dots = cellsA.select(col("r").cast("int").as("r"), col("c"), col("cnt").as("__a"))
      .join(cellsB.select(col("r").cast("int").as("r"), col("c"), col("cnt").as("__b")), Seq("r", "c"))
      .groupBy(col("r"))
      .agg(sum(col("__a") * col("__b")).as("__dot"))
    // a row whose cell sets are disjoint has dot 0 — and a true common key
    // populates the SAME cell in every row, so any all-zero row proves the
    // true join size is 0; reindex over the full row domain so the min
    // sees those zeros instead of skipping them
    cellsA.sparkSession.range(depth).select(col("id").cast("int").as("r"))
      .join(dots, Seq("r"), "left_outer")
      .agg(min(coalesce(col("__dot"), lit(0L))).as("join_size_est"))
  }

  /** HLL register table: (bucket, rho) with rho = max rank observed, at
    * most m rows out of one map-side-combined aggregate over DISTINCT-
    * insensitive input (duplicates cannot raise a max — no pre-distinct
    * shuffle needed, the whole point of the sketch). */
  def hllRegisters(keys: DataFrame, keyCol: String, m: Int = 1024): DataFrame = {
    require(m >= 16 && 4096 % m == 0,
      s"m must divide 4096 for a uniform bucket reduction, got $m")
    val k = col(s"`$keyCol`")
    val v = hexSlice(k, 4, 15) // 60-bit rank source
    keys.where(k.isNotNull).select(
        (hexSlice(k, 1, 3) % m).as("bucket"),
        when(v === 0L, lit(61L)).otherwise(lit(61L) - length(bin(v))).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("rho"))
  }

  /** Per-GROUP HyperLogLog register table: (group, bucket, rho) with rho =
    * max rank observed within the group — the cardinality report every
    * curation pipeline emits ("distinct shingles per language", "distinct
    * source URLs per domain") without the corpus-keyed shuffle of exact
    * `count_distinct` and without Spark's engine-private
    * `approx_count_distinct` state.
    *
    * Same register discipline as [[hllRegisters]], with the group column
    * riding the register key: max-aggregates combine map-side (duplicates
    * within a partition collapse before the exchange), so the shuffle
    * carries at most groups × m register rows per map partition — a
    * constant per group, never the group's rows. Merging two corpora's
    * group-register tables is the same per-(group, bucket) max. */
  def hllGroupRegisters(keys: DataFrame, groupCol: String, keyCol: String,
                        m: Int = 1024): DataFrame = {
    require(m >= 16 && 4096 % m == 0,
      s"m must divide 4096 for a uniform bucket reduction, got $m")
    val g = col(s"`$groupCol`")
    val k = col(s"`$keyCol`")
    val v = hexSlice(k, 4, 15) // 60-bit rank source, same layout as hllRegisters
    keys.where(k.isNotNull && g.isNotNull).select(
        g.as(groupCol),
        (hexSlice(k, 1, 3) % m).as("bucket"),
        when(v === 0L, lit(61L)).otherwise(lit(61L) - length(bin(v))).as("rho"))
      .groupBy(g, col("bucket")).agg(max(col("rho")).as("rho"))
  }

  /** Union of two HLL register tables by per-bucket MAX — the lossless
    * set-union law every HLL inherits from max's associativity:
    * registers(A) ⊔ registers(B) == registers(A ∪ B) EXACTLY, register
    * for register (a max over a partitioned multiset equals the max over
    * the whole — not an approximation, unlike the estimates themselves).
    * This is what makes register tables composable corpus statistics:
    * per-source sketches built independently (different days, different
    * clusters) union into exactly the sketch a single pass over the
    * combined corpus would build. Full-outer on bucket: a bucket filled
    * in only one input carries that input's rho. */
  def hllMergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bucket"), col("rho").as("rho_a"))
      .join(b.select(col("bucket"), col("rho").as("rho_b")), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        greatest(coalesce(col("rho_a"), lit(0L)), coalesce(col("rho_b"), lit(0L))).as("rho"))

  /** Inclusion–exclusion distinct-overlap estimate from three register
    * tables (driver-side floats, never oracle-compared — the
    * [[hllEstimate]] discipline): |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B).
    * The union sketch comes from [[hllMergeRegisters]] — no re-scan of
    * either corpus. Error compounds across the three estimates (each
    * ±1.04/√m), so the RELATIVE error on the intersection grows as the
    * overlap shrinks: fine for "how much vocabulary do these two sources
    * share", wrong for needle-in-haystack overlaps (use the exact
    * decontamination joins for those). */
  def hllIntersectionEstimate(regsA: Seq[(Long, Long)], regsB: Seq[(Long, Long)],
                              regsUnion: Seq[(Long, Long)], m: Int): Double =
    hllEstimate(regsA, m) + hllEstimate(regsB, m) - hllEstimate(regsUnion, m)

  /** Driver-side HLL estimate from a (collected) register table — the
    * raw HyperLogLog estimator with the small-range linear-counting
    * correction. Float arithmetic lives HERE (driver, m-sized input),
    * never in an oracle-compared column. */
  def hllEstimate(registers: Seq[(Long, Long)], m: Int): Double = {
    val rho = new Array[Long](m)
    registers.foreach { case (b, r) => rho(b.toInt) = r }
    // Flajolet et al. 2007 prescribe FIXED alpha at small m — the
    // asymptotic 0.7213/(1+1.079/m) formula only holds for m >= 128 and
    // carries avoidable bias below it (advisor r12)
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val harm = rho.map(r => math.pow(2.0, -r.toDouble)).sum
    val raw = alpha * m * m / harm
    val zeros = rho.count(_ == 0L)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
