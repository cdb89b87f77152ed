package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk analytics over quasi-identifiers — the measurement side of
  * the masking engine (the reference masks columns; a real deployment first
  * has to find out WHICH grouping of quasi-identifiers re-identifies people
  * and how coarse the generalization must be to stop it).
  *
  * Two operators:
  *   - [[anonymityReport]]: per-equivalence-class k-anonymity + l-diversity
  *     (Sweeney 2002; Machanavajjhala et al. 2007 "l-diversity") — one
  *     hash-aggregate over the quasi-identifier tuple.
  *   - [[generalizationLadder]]: for a numeric quasi-identifier and a ladder
  *     of bucket widths, compute every ladder level's anonymity profile in a
  *     SINGLE pass (explode by level — L is tiny, ≤ ~6) and mark the
  *     coarsest-necessary (minimal) level whose every class reaches k.
  *
  * Scale shape: both are one shuffle on the (generalized) quasi tuple with
  * map-side partial aggregation; the ladder multiplies the scan by L before
  * the shuffle, not after (partials absorb it). No windows over a global
  * ordering, no driver collects. Integer observables only (group sizes,
  * distinct counts, bucket floors), so any engine replays the report
  * bit-for-bit.
  */
object Privacy {

  /** Per-equivalence-class report: one row per distinct quasi-identifier
    * tuple with its size (k of that class), the number of distinct
    * sensitive values seen in it (its l-diversity), and pass flags against
    * the required k and l. Rows where `k_ok = 0` are exactly the records a
    * masking pipeline must treat before release.
    */
  def anonymityReport(df: DataFrame, quasi: Seq[String], sensitive: String,
                      k: Int, l: Int): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, "k and l must be positive")
    df.groupBy(quasi.map(c => col(s"`$c`")): _*)
      .agg(
        count(lit(1)).as("class_size"),
        count_distinct(col(s"`$sensitive`")).as("l_diversity"))
      .select(quasi.map(c => col(s"`$c`")) ++ Seq(
        col("class_size"),
        col("l_diversity"),
        (col("class_size") >= k).cast("long").as("k_ok"),
        (col("l_diversity") >= l).cast("long").as("l_ok")): _*)
  }

  /** Per-class t-closeness report (Li, Li & Venkatasubramanian 2007,
    * ICDE — the third leg of the release triple after k-anonymity and
    * l-diversity: a class can be large AND diverse yet still leak when
    * its sensitive-value DISTRIBUTION differs from the table's): for each
    * quasi-identifier class, the total variation distance between the
    * class's sensitive distribution and the global one, on an exact ppm
    * grid. TVD = Σ_v max(p_class(v) − p_global(v), 0) — the one-sided
    * form needs only values PRESENT in the class (absent values have
    * p_class = 0 and contribute nothing to the positive side), so no
    * class × value-domain expansion ever materializes.
    *
    * Exact integers end to end: per (class, v) the positive part is
    * max(cnt_cv·N − cnt_v·n_c, 0) over the common denominator n_c·N;
    * ONE floor after the per-class sum, so engines can't disagree by
    * summation order. Overflow headroom: Σ pos ≤ n_c·N, so the scaled
    * numerator is ≤ n_c·N·10⁶ — callers at N beyond ~10⁹ rows should
    * bucket the sensitive column (they must anyway for the distance to
    * mean anything) and run per-partition releases.
    *
    * Scale shape: two keyed aggregates over (quasi, v) and (quasi) with
    * map-side combine, one broadcast of the value-domain-sized global
    * table, zero joins on data rows. NULL quasi values group together
    * (same contract as [[anonymityReport]]). */
  def tClosenessReport(df: DataFrame, quasi: Seq[String], sensitive: String,
                       tPpm: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(tPpm >= 0 && tPpm <= 1000000L, "t is in ppm [0, 1e6]")
    val qs = quasi.map(c => col(s"`$c`"))
    val v = col(s"`$sensitive`")
    val global = df.groupBy(v.as("__v")).agg(count(lit(1)).as("__cnt_v"))
    val nAll = df.count()
    require(nAll > 0, "t-closeness needs at least one row")
    val classCounts = df.groupBy(qs :+ v.as("__v"): _*).agg(count(lit(1)).as("__cnt_cv"))
    // class sizes via a window over the (class, v) frame, NOT a join on
    // the quasi columns: Window.partitionBy groups NULL quasi values
    // together (the anonymityReport contract) where an equi-join would
    // silently drop null-keyed classes
    val w = org.apache.spark.sql.expressions.Window.partitionBy(qs: _*)
    // NULL-SAFE join on the sensitive value (advisor r15 #1): NULL is a
    // distinct sensitive value, present in BOTH the class distribution
    // and the global one. An equi-join would count null-sensitive rows
    // in n_c (the window sum) yet drop them from the TVD numerator,
    // silently UNDERSTATING t_ppm — a privacy gate must fail closed,
    // not leak open, when the sensitive column has nulls.
    classCounts
      .withColumn("__n_c", sum(col("__cnt_cv")).over(w))
      .join(broadcast(global.withColumnRenamed("__v", "__gv")),
        col("__v") <=> col("__gv"))
      .drop("__gv")
      .withColumn("__pos",
        greatest(col("__cnt_cv") * nAll - col("__cnt_v") * col("__n_c"), lit(0L)))
      .groupBy(qs: _*)
      .agg(max(col("__n_c")).as("class_size"), sum(col("__pos")).as("__sum_pos"))
      .select(qs ++ Seq(
        col("class_size"),
        expr(s"(__sum_pos * 1000000) div (class_size * $nAll)").as("t_ppm")): _*)
      .withColumn("t_ok", (col("t_ppm") <= tPpm).cast("long"))
  }

  /** Floor-to-bucket generalization of an integer column that is exact and
    * engine-portable for NEGATIVE values too: `v - pmod(v, width)` (plain
    * integer-division floors toward zero, which would merge the two buckets
    * around 0). */
  def bucketFloor(v: Column, width: Long): Column = v - pmod(v, lit(width))

  /** Evaluate a generalization ladder over one integer quasi-identifier
    * column (`numericQuasi`, e.g. account balance in cents) combined with
    * categorical quasi columns that stay as-is. For each ladder width,
    * report the number of equivalence classes, the minimum class size, and
    * the count of records living in classes below k; `chosen = 1` marks the
    * SMALLEST width whose minimum class size reaches k (the least
    * information loss that satisfies k-anonymity). The ladder should end in
    * a width wide enough to be a safe fallback (one bucket).
    *
    * One job: explode each row into L (row, width) pairs, aggregate on
    * (width, bucket, categorical quasi) with map-side partials, then a
    * second tiny aggregate to one row per width (L rows total).
    */
  def generalizationLadder(df: DataFrame, numericQuasi: String,
                           widths: Seq[Long], categoricalQuasi: Seq[String],
                           k: Int): DataFrame = {
    require(widths.nonEmpty, "ladder must have at least one width")
    require(widths.forall(_ >= 1), "widths must be positive")
    val exploded = df.select(
      (categoricalQuasi.map(c => col(s"`$c`")) :+
        explode(array(widths.map(w => struct(
          lit(w).as("width"),
          bucketFloor(col(s"`$numericQuasi`").cast("long"), w).as("bucket"))): _*)).as("g")): _*)
    val classes = exploded
      .groupBy((Seq(col("g.width")) ++ categoricalQuasi.map(c => col(s"`$c`")) :+ col("g.bucket")): _*)
      .agg(count(lit(1)).as("class_size"))
    val perLevel = classes.groupBy(col("width"))
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("min_class_size"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(lit(0L)))
          .as("rows_below_k"))
    // L rows total: the single-partition window is over the ladder, not data.
    val overAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    perLevel.select(
      col("width"),
      col("n_classes"),
      col("min_class_size"),
      col("rows_below_k"),
      coalesce(
        col("width") === min(when(col("min_class_size") >= k, col("width"))).over(overAll),
        lit(false)) // no level satisfies k -> no row chosen (NULL min)
        .cast("long").as("chosen"))
  }

  // -------------------------------------------------------------------
  // Differentially-private count release — the privacy family's OUTPUT
  // side (anonymityReport / tClosenessReport measure risk; this releases
  // aggregate counts with calibrated noise).
  // -------------------------------------------------------------------

  /** Noise half-life parameter of the release: discrete Laplace with
    * p = 1/2, i.e. P(X = k) = (1/3)·2^(−|k|) — the two-sided geometric
    * mechanism (Ghosh, Roughgarden & Sundararajan 2009, "Universally
    * utility-maximizing privacy mechanisms") at ε = ln 2 per released
    * count (sensitivity 1: one person adds or removes one row of one
    * class). p = 1/2 is chosen so every CDF value is the exact rational
    * (3·2^j ± 2)/(3·2^j): the inverse-CDF threshold table is computed in
    * integer arithmetic and the draw is integer comparisons — seeded,
    * engine-portable, and replayable like every other randomized-looking
    * operator in this engine. ε in ppm, for reports. */
  val dpEpsilonPpm: Long = 693147L // ln 2

  /** The seeded discrete-Laplace draw as ANSI-SQL CASE text over a
    * uniform 60-bit integer expression (the engine's portable md5
    * hex-slice hash): noise = min k in [−maxNoise, maxNoise] with
    * h < floor(2^60 · F(k)). Thresholds are exact BigInteger floors of
    * the rational CDF, interpolated as literals, so Spark and DuckDB
    * execute the IDENTICAL draw — replay by construction. Tails beyond
    * ±maxNoise clamp inward (truncated mechanism; with maxNoise = 40
    * the clamped mass is < 2^−40 ≈ 1e−12 per side) and the 2^−60
    * quantization of the floor is the draw's definition, not an error
    * term. */
  def dpNoiseCaseSql(hashExpr60: String, maxNoise: Int = 40): String = {
    require(maxNoise >= 1 && maxNoise <= 59, "maxNoise in [1, 59]")
    val m = java.math.BigInteger.ONE.shiftLeft(60)
    def t(k: Int): java.math.BigInteger = {
      // F(-j) = 2 / (3·2^j)  (j >= 1);  F(k) = (3·2^(k+1) − 2) / (3·2^(k+1))
      val (num, den) =
        if (k < 0) (java.math.BigInteger.TWO,
          java.math.BigInteger.valueOf(3).shiftLeft(-k))
        else (java.math.BigInteger.valueOf(3).shiftLeft(k + 1).subtract(java.math.BigInteger.TWO),
          java.math.BigInteger.valueOf(3).shiftLeft(k + 1))
      m.multiply(num).divide(den)
    }
    // plain integer literals only: the text must parse identically in
    // Spark SQL and DuckDB (no engine-specific typed-literal suffixes)
    val branches = (-maxNoise until maxNoise)
      .map(k => s"WHEN $hashExpr60 < ${t(k)} THEN $k")
    s"(CASE ${branches.mkString(" ")} ELSE $maxNoise END)"
  }

  /** Per-release seed token: hex(SHA-256(secret ‖ domain-sep label ‖
    * release label)). The DRAW is keyed by this token, not by the public
    * release label alone: DP requires the noise to be UNPREDICTABLE to
    * anyone holding only the released output, and a draw derived from
    * public inputs (label + group values, both visible in the release)
    * is replayable — subtracting it recovers the true count (advisor
    * r16, high). Embedding the TOKEN in the generated SQL (never the
    * secret) means plan text for one release reveals nothing about any
    * other release's draws; the caller's obligations are (a) the secret
    * stays secret and (b) each release label is used ONCE per population
    * (the ε ledger). Test oracles may replay the draw because the test
    * knows its own secret — that replay is the correctness check, not a
    * leak. */
  def dpSeedToken(secret: Array[Byte], release: String): String = {
    require(secret != null && secret.length >= 16,
      "DP seed secret must be >= 16 bytes (the noise is only as unpredictable as this secret)")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(secret)
    md.update("graft-dp-seed-v1".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    md.update(release.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.digest().take(16).map(b => f"$b%02x").mkString
  }

  /** One group column's contribution to the draw key, null-safe and
    * injective: NULL encodes as the fixed term `:n` (a NULL value must
    * get a real per-group draw, not fall through concat-of-NULL to the
    * constant ELSE clamp — advisor r16), and non-null values are
    * length-prefixed (`:v<len>:<value>`) so no separator characters in
    * the data can make two distinct group tuples collide onto one key.
    * `castSql` is the engine's string-cast spelling (the one dialect
    * divergence between Spark and DuckDB here). */
  private def keyTerm(colSql: String, castSql: String => String): String = {
    val v = castSql(colSql)
    val len = castSql(s"length($v)")
    s"CASE WHEN $colSql IS NULL THEN ':n' ELSE concat(':v', $len, ':', $v) END"
  }

  private def keyTerms(cols: Seq[String], castSql: String => String): String =
    cols.map(c => keyTerm(c, castSql)).mkString(", ")

  /** Spark spelling of the 60-bit uniform draw key. */
  private def hash60(token: String, groupBy: Seq[String]): String = {
    val key = s"concat('$token', ${keyTerms(groupBy.map(c => s"`$c`"), s => s"CAST($s AS STRING)")})"
    s"CAST(conv(substring(md5($key), 1, 15), 16, 10) AS BIGINT)"
  }

  /** DuckDB spelling of the IDENTICAL 60-bit draw key — exposed so the
    * correctness oracle is generated from the same term builder as the
    * engine side and the two can never drift. */
  def hash60DuckSql(token: String, cols: Seq[String]): String = {
    val key = s"concat('$token', ${keyTerms(cols, s => s"CAST($s AS VARCHAR)")})"
    s"('0x' || substr(md5($key), 1, 15))::UBIGINT::BIGINT"
  }

  /** ε = ln 2 differentially-private per-group counts: groups by the
    * given columns, adds seeded discrete-Laplace noise keyed by
    * (secret-derived release token, group values) — the SAME release
    * label must never be used twice over the same population under one
    * secret (re-release under a new label costs another ε; that
    * accounting is the caller's ledger), and the secret must not be
    * shared with release consumers (see [[dpSeedToken]]). Output is
    * (groups…, n_noisy) ONLY — the true count never leaves the operator.
    * Noisy counts can be negative (the unbiased release; consumers clamp
    * at read time if they need display-valid numbers).
    *
    * Scale shape: one counting shuffle with map-side combine (the same
    * cost as the non-private count), then a per-row codegen'd CASE —
    * noise adds nothing to the plan's data movement. */
  def dpNoisyCounts(df: DataFrame, groupBy: Seq[String], release: String,
                    secret: Array[Byte], maxNoise: Int = 40): DataFrame = {
    require(groupBy.nonEmpty, "need at least one group column")
    require(release.matches("[A-Za-z0-9_.-]+"),
      s"release label must be [A-Za-z0-9_.-]+ (it is hashed into the draw): '$release'")
    val token = dpSeedToken(secret, release)
    val counts = df.groupBy(groupBy.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("__n"))
    // project the draw key ONCE: dpNoiseCaseSql substitutes its hash
    // argument into every one of the 2·maxNoise CASE branches, and the
    // r17 secret-keyed key is ~3x longer — inlining it 80 times tripled
    // the expression tree and the plan-compile wall (bench r17 flag)
    counts.selectExpr(groupBy.map(c => s"`$c`") ++ Seq("__n",
      s"${hash60(token, groupBy)} AS __h"): _*)
      .selectExpr(groupBy.map(c => s"`$c`") :+
        s"__n + ${dpNoiseCaseSql("__h", maxNoise)} AS n_noisy": _*)
  }

  /** ε = ln 2 differentially-private per-group SUMS with contribution
    * clamping: each row's value is clamped to [0, clip] BEFORE summing
    * (the clamp, not the data, sets the sensitivity — one person moves
    * the sum by at most `clip`), then noise = clip × the same seeded
    * discrete-Laplace draw, scaled so one noise unit covers one clip of
    * sensitivity and the ln 2 guarantee carries over unchanged. Noisy
    * sums land on the clip grid around the clamped truth and can be
    * negative; the clamped truth never leaves the operator. Same
    * secret + release-label ledger rules as [[dpNoisyCounts]] (counts and
    * sums of one population under one label cost TWO releases). */
  def dpNoisySums(df: DataFrame, groupBy: Seq[String], valueCol: String,
                  clip: Long, release: String, secret: Array[Byte],
                  maxNoise: Int = 40): DataFrame = {
    require(groupBy.nonEmpty, "need at least one group column")
    require(clip >= 1, "clip must be >= 1")
    require(release.matches("[A-Za-z0-9_.-]+"),
      s"release label must be [A-Za-z0-9_.-]+ (it is hashed into the draw): '$release'")
    val token = dpSeedToken(secret, release)
    val clamped = least(greatest(col(s"`$valueCol`").cast("long"), lit(0L)), lit(clip))
    val sums = df.groupBy(groupBy.map(c => col(s"`$c`")): _*)
      .agg(sum(clamped).as("__s"))
    sums.selectExpr(groupBy.map(c => s"`$c`") ++ Seq("__s",
      s"${hash60(token, groupBy)} AS __h"): _*)
      .selectExpr(groupBy.map(c => s"`$c`") :+
        s"__s + $clip * ${dpNoiseCaseSql("__h", maxNoise)} AS sum_noisy": _*)
  }
}
