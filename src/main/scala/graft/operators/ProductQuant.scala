package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the memory-bounded ANN path that
  * complements the exact ([[Similarity.topK]]), LSH and IVF variants: the
  * vector is split into `m` subvectors, each subspace gets its own small
  * codebook (k-means), and a vector is stored as `m` code bytes. Query
  * time is a per-subspace distance TABLE against the query (asymmetric
  * distance computation, ADC) and a table-lookup sum per corpus vector —
  * no float math touches the corpus at probe time.
  *
  * Everything runs on an EXACT integer grid (`scale`, like
  * [[Similarity.integerCentroids]]): elements snap to longs first,
  * centroids are floor-means in pure long arithmetic, distances are
  * integer squared-Euclidean, and argmins tie toward the smallest code —
  * so codebooks, codes, and the final top-k are a pure function of the
  * input, bit-identical across engines and partitionings, and the
  * `ann_pq_topk` oracle replays training, encoding, AND the ADC probe in
  * SQL. (Real deployments would train on floats; determinism is worth
  * more to a reproducible pipeline than the last ulp of centroid
  * placement, and the grid error is 1e-6 per element.)
  *
  * Scale shape: training/encoding explodes each vector once (narrow) and
  * joins against the codebook on (subspace, position) — the codebook is
  * `m * nCodes * subDim` rows, always broadcast, so the corpus never
  * shuffles to meet it; the per-round aggregates are map-side-combined
  * groupBys keyed by (vector, subspace[, code]). The ADC probe touches
  * only the (vector, subspace, code) code table — `m` rows per corpus
  * vector, a ~100x reduction over the raw floats at dim 64 / m 8 — joins
  * the broadcast distance table, and takes top-k with
  * TakeOrderedAndProject, never a global sort. Code-table rows per
  * vector are CONSTANT in corpus size; cost is linear by construction.
  */
object ProductQuant {

  /** Quantized subvector elements: (vid, s, spos, q) — subspace `s` in
    * [0,m), in-subspace position `spos` in [0,subDim), `q` the element
    * rounded (HALF_UP, matching SQL `round`) onto the `scale` grid.
    * NULL embeddings and NULL elements are dropped. `dim` must be m *
    * subDim; shorter vectors simply produce fewer rows (their missing
    * positions contribute zero distance — document-level hygiene is the
    * caller's job). */
  def quantized(df: DataFrame, idCol: String, embCol: String, m: Int, subDim: Int,
                scale: Long = 1000000L): DataFrame = {
    require(m > 0 && subDim > 0 && scale > 0, "m, subDim, scale must be positive")
    df.where(col(s"`$embCol`").isNotNull)
      .select(col(s"`$idCol`").cast("long").as("vid"),
        posexplode(col(s"`$embCol`").cast("array<double>")).as(Seq("pos", "v")))
      .where(col("v").isNotNull && col("pos") < m * subDim)
      .select(col("vid"),
        (col("pos") / subDim).cast("int").as("s"),
        pmod(col("pos"), lit(subDim)).as("spos"),
        round(col("v") * scale, 0).cast("long").as("q"))
  }

  /** Exact floor-mean centroids of an assignment: (s, code, spos, c).
    * Codes that lost every member simply disappear (standard k-means
    * empty-cluster behavior; the SQL replay matches because GROUP BY
    * yields only surviving groups). */
  private def centroidsOf(qz: DataFrame, assign: DataFrame): DataFrame =
    qz.join(assign, Seq("vid", "s"))
      .groupBy(col("s"), col("code"), col("spos"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"))
      // floor division in pure Long arithmetic (same idiom as
      // integerCentroids — doubles lose exactness past 2^53)
      .select(col("s"), col("code"), col("spos"),
        expr("(sum_q - pmod(sum_q, n)) div n").as("c"))

  /** Nearest-code assignment against a codebook: (vid, s, code), distance
    * ties toward the SMALLEST code (one lexicographic struct min, never a
    * per-key window sort). The codebook is broadcast — the corpus-sized
    * side never shuffles to meet it. Public as `encode`: the (vid, s,
    * code) table IS the stored PQ representation (m small ints per
    * vector — the ~100x compression that makes corpus-scale ANN fit). */
  def encode(qz: DataFrame, codebook: DataFrame): DataFrame = assignStep(qz, codebook)

  private def assignStep(qz: DataFrame, codebook: DataFrame): DataFrame =
    qz.join(broadcast(codebook), Seq("s", "spos"))
      .groupBy(col("vid"), col("s"), col("code"))
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("dist"))
      .groupBy(col("vid"), col("s"))
      .agg(min(struct(col("dist"), col("code"))).as("w"))
      .select(col("vid"), col("s"), col("w.code").as("code"))

  /** Train per-subspace codebooks: hash-init assignment (code =
    * pmod(vid*31 + s*7, nCodes) — k-means++ would be better placement but
    * is order-dependent; a hash init is a pure function of ids), then
    * `lloydIters` rounds of assign + exact-mean recompute. Returns the
    * final codebook (s, code, spos, c). `qz` should be persisted by the
    * caller when lloydIters > 0 (it is consumed 2 + 2*iters times). */
  def trainCodebooks(qz: DataFrame, nCodes: Int, lloydIters: Int): DataFrame = {
    require(nCodes > 0 && lloydIters >= 0, "nCodes positive, lloydIters non-negative")
    val init = qz.select(col("vid"), col("s")).distinct()
      .select(col("vid"), col("s"), pmod(col("vid") * 31 + col("s") * 7, lit(nCodes.toLong)).as("code"))
    var cb = centroidsOf(qz, init)
    (1 to lloydIters).foreach { _ =>
      cb = centroidsOf(qz, assignStep(qz, cb))
    }
    cb
  }

  /** End-to-end PQ ANN: train, encode, ADC-probe. Returns the top `k`
    * corpus vectors by approximate (integer) squared distance to
    * `query`: (vid, pq_dist, rank), rank by (distance asc, vid asc).
    * The ADC distance table (m * nCodes longs) is computed driver-side
    * from the collected codebook — the codebook is bounded by
    * m * nCodes * subDim rows by construction, never data-sized. */
  def adcTopK(df: DataFrame, idCol: String, embCol: String, query: Array[Double],
              k: Int, m: Int, nCodes: Int = 16, lloydIters: Int = 1,
              scale: Long = 1000000L, excludeId: Option[Long] = None): DataFrame = {
    require(query.length % m == 0, s"query dim ${query.length} not divisible by m=$m")
    val subDim = query.length / m
    val qz = quantized(df, idCol, embCol, m, subDim, scale)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // collect the trained codebook (bounded m*nCodes*subDim rows) and feed
    // the FINAL encode from the collected literal — the deferred top-k
    // action then rescans only the narrow quantize lineage instead of
    // re-running every training round after qz is unpersisted
    val cbRows = trainCodebooks(qz, nCodes, lloydIters).collect()

    // driver-side ADC table: quantize the query with the SAME rounding
    // (BigDecimal HALF_UP == SQL round — java.lang.Math.round differs on
    // negative halves and would silently diverge from the executors)
    val qq = query.map(v => BigDecimal(v * scale)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val dtable = cbRows.groupBy(r => (r.getInt(0), r.getLong(1))).map { case ((s, code), rows) =>
      val d = rows.map { r =>
        val diff = qq(s * subDim + r.getInt(2)) - r.getLong(3)
        diff * diff
      }.sum
      (s, code, d)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val dt = dtable.toDF("s", "code", "d")
    val cbLit = cbRows.toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toDF("s", "code", "spos", "c")
    val codes = assignStep(qz, cbLit)
    qz.unpersist(blocking = false)

    val filtered = excludeId.map(x => codes.where(col("vid") =!= x)).getOrElse(codes)
    val out = filtered.join(broadcast(dt), Seq("s", "code"))
      .groupBy(col("vid"))
      .agg(sum(col("d")).as("pq_dist"))
      .orderBy(col("pq_dist").asc, col("vid").asc)
      .limit(k)
    out
  }
}
