package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ProductQuantSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def df(vecs: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    vecs.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("vec_id", "embedding")
  }

  /** Scalar PQ replay with the operator's exact arithmetic. */
  private def scalarAdc(vecs: Seq[(Long, Seq[Double])], query: Seq[Double],
                        m: Int, nCodes: Int, lloydIters: Int,
                        scale: Long = 1000000L): Seq[(Long, Long)] = {
    val subDim = query.length / m
    def quant(v: Double): Long =
      BigDecimal(v.toFloat.toDouble * scale).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val qz = vecs.flatMap { case (id, v) =>
      v.zipWithIndex.map { case (x, p) => (id, p / subDim, p % subDim, quant(x)) }
    }
    def centroids(assign: Map[(Long, Int), Long]): Map[(Int, Long, Int), Long] =
      qz.groupBy(r => (r._2, assign((r._1, r._2)), r._3)).view.mapValues { rows =>
        val s = rows.map(_._4).sum
        Math.floorDiv(s, rows.size.toLong)
      }.toMap
    def assignStep(cb: Map[(Int, Long, Int), Long]): Map[(Long, Int), Long] =
      qz.groupBy(r => (r._1, r._2)).view.mapValues { rows =>
        val s = rows.head._2
        val codes = cb.keys.collect { case (`s`, c, _) => c }.toSeq.distinct
        codes.map { c =>
          val d = rows.map(r => { val dd = r._4 - cb((s, c, r._3)); dd * dd }).sum
          (d, c)
        }.minBy(identity)._2
      }.toMap
    var assign = qz.map(r => (r._1, r._2)).distinct
      .map { case (id, s) => (id, s) -> ((id * 31 + s * 7) % nCodes + nCodes) % nCodes }.toMap
    var cb = centroids(assign)
    (1 to lloydIters).foreach { _ => assign = assignStep(cb); cb = centroids(assign) }
    val finalAssign = assignStep(cb)
    val qq = query.map(quant)
    val dt = cb.keys.map(k => (k._1, k._2)).toSeq.distinct.map { case (s, c) =>
      (s, c) -> (0 until subDim).map { sp =>
        val d = qq(s * subDim + sp) - cb((s, c, sp)); d * d
      }.sum
    }.toMap
    vecs.map(_._1).map(id => id -> (0 until m).map(s => dt((s, finalAssign((id, s))))).sum)
      .sortBy { case (id, d) => (d, id) }
  }

  test("matches the scalar replay end-to-end on a mixed fixture") {
    val vecs = (0L until 12L).map { i =>
      i -> (0 until 4).map(d => ((i * 7 + d * 3) % 11).toDouble / 10.0 - 0.5)
    }
    val query = vecs.head._2
    val expected = scalarAdc(vecs, query, m = 2, nCodes = 2, lloydIters = 1)
      .filter(_._1 != 0L).take(5)
    val got = ProductQuant.adcTopK(df(vecs), "vec_id", "embedding", query.toArray,
      k = 5, m = 2, nCodes = 2, lloydIters = 1, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("duplicates of the query share its codes and its ADC distance exactly") {
    // 3 exact copies of the query among 20 spread vectors. NOTE: rank-first
    // is NOT a PQ guarantee (a vector in a cell whose centroid lies nearer
    // the query can beat the query's own cell) — the guaranteed invariant
    // is identical quantization -> identical codes -> identical distance.
    val base = (0L until 20L).map { i =>
      i -> (0 until 8).map(d => ((i * 13 + d * 5) % 17).toDouble / 8.0 - 1.0)
    }
    val q = base(3L.toInt)._2
    val vecs = base ++ Seq(100L -> q, 101L -> q)
    val rows = ProductQuant.quantizedRows(df(vecs), "vec_id", "embedding", m = 4, subDim = 2)
    val cb = ProductQuant.trainCodebooks(rows, m = 4, subDim = 2, nCodes = 4, lloydIters = 1)
    val codes = ProductQuant.encode(rows, cb, m = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(100L) === codes(3L) && codes(101L) === codes(3L))
    val dists = ProductQuant.adcTopK(df(vecs), "vec_id", "embedding", q.toArray,
      k = 22, m = 4, nCodes = 4, lloydIters = 1, excludeId = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dists(3L) === dists(100L) && dists(3L) === dists(101L))
  }

  test("deterministic across runs and partitionings") {
    val vecs = (0L until 30L).map { i =>
      i -> (0 until 8).map(d => ((i * 11 + d * 7) % 23).toDouble / 11.0 - 1.0)
    }
    val q = vecs(5L.toInt)._2.toArray
    def run(parts: Int) = ProductQuant.adcTopK(df(vecs).repartition(parts),
      "vec_id", "embedding", q, k = 10, m = 4, nCodes = 4, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(1) === run(7))
  }

  test("codebook stays bounded: at most m * nCodes codewords, each full subDim") {
    val vecs = (0L until 40L).map { i =>
      i -> (0 until 8).map(d => ((i + d) % 5).toDouble)
    }
    val rows = ProductQuant.quantizedRows(df(vecs), "vec_id", "embedding", m = 4, subDim = 2)
    val cb = ProductQuant.trainCodebooks(rows, m = 4, subDim = 2, nCodes = 8, lloydIters = 1)
    assert(cb.size <= 4 * 8)
    cb.foreach(cw => assert(cw.centroid.size === 2))
    // sorted by (s, code) — the ordering every literal dispatch relies on
    assert(cb.map(cw => (cw.s, cw.code)) === cb.map(cw => (cw.s, cw.code)).sorted)
  }

  test("encode and the ADC probe are shuffle-free narrow projections") {
    val vecs = (0L until 30L).map { i =>
      i -> (0 until 8).map(d => ((i * 11 + d * 7) % 23).toDouble / 11.0 - 1.0)
    }
    val rows = ProductQuant.quantizedRows(df(vecs), "vec_id", "embedding", m = 4, subDim = 2)
    val cb = ProductQuant.trainCodebooks(rows, m = 4, subDim = 2, nCodes = 4, lloydIters = 1)
    val encPlan = ProductQuant.encode(rows, cb, m = 4)
      .queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"),
      "encoding must be an in-row projection against the literal codebook")
    // the end-to-end probe may only exchange inside codebook TRAINING
    // (bounded key space) and the TakeOrdered top-k — never a hash
    // exchange of corpus-derived scored rows. The probe stage itself is
    // the final projection; assert it contains the TakeOrdered and no
    // sort-exchange pair.
    val probePlan = ProductQuant.adcTopK(df(vecs), "vec_id", "embedding",
      vecs.head._2.toArray, k = 5, m = 4, nCodes = 4, lloydIters = 0)
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("TakeOrderedAndProject"), probePlan)
    assert(!probePlan.contains("Exchange"), probePlan)
  }

  test("ivfAdcTopK: probe structurally excludes unprobed lists; full probe covers all") {
    val vecs = (0L until 60L).map { i =>
      i -> (0 until 8).map(d => ((i * 17 + d * 3) % 29).toDouble / 7.0 - 2.0)
    }
    val q = vecs(4L.toInt)._2.toArray
    def run(nProbe: Int) = ProductQuant.ivfAdcTopK(df(vecs), "vec_id", "embedding", q,
      k = 60, m = 4, nLists = 4, nProbe = nProbe, nCodes = 4, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val partial = run(1)
    val full = run(4)
    assert(full.length === 60, "nProbe = nLists must cover the whole corpus")
    assert(partial.length < 60, "nProbe < nLists must structurally exclude lists")
    // probed-list scores agree between partial and full probe (routing
    // changes WHICH vectors are visible, never their distances)
    val fullMap = full.toMap
    partial.foreach { case (vid, d) => assert(fullMap(vid) === d, s"vid $vid") }
  }

  test("ivfAdcTopK is deterministic across partitionings; query duplicates tie") {
    val base = (0L until 40L).map { i =>
      i -> (0 until 8).map(d => ((i * 7 + d * 11) % 19).toDouble / 5.0 - 1.5)
    }
    val q = base(9L.toInt)._2
    val vecs = base ++ Seq(200L -> q)
    def run(parts: Int) = ProductQuant.ivfAdcTopK(df(vecs).repartition(parts),
      "vec_id", "embedding", q.toArray, k = 41, m = 4, nLists = 4, nProbe = 4,
      nCodes = 4, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val a = run(1)
    assert(a === run(9))
    val m2 = a.toMap
    // identical vectors -> same list, same residual, same codes, same ADC dist
    assert(m2(9L) === m2(200L))
  }

  test("quantizationError: identical vectors share error; far outliers dominate") {
    // 4 distinct vectors repeated 10x; codewords are means of data subsets,
    // so they live inside the data's bounding box — a far-outside vector
    // must carry a strictly larger reconstruction error than any original
    val distinct4 = (0 until 4).map(c => (0 until 4).map(d => (c * 10 + d).toDouble))
    val vecs = (0L until 40L).map(i => i -> distinct4((i % 4L).toInt))
    val rows = ProductQuant.quantizedRows(df(vecs), "vec_id", "embedding", m = 2, subDim = 2)
    val cb = ProductQuant.trainCodebooks(rows, m = 2, subDim = 2, nCodes = 4, lloydIters = 1)
    val vecs2 = vecs :+ (100L -> (0 until 4).map(d => 500.0 + d))
    val errs = ProductQuant.quantizationError(df(vecs2), "vec_id", "embedding", cb, m = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(errs.size === 41)
    // identical inputs -> identical codes -> identical error
    (0 until 4).foreach { c =>
      val group = (0L until 40L).filter(_ % 4 == c).map(errs)
      assert(group.distinct.size === 1, s"cluster $c errors diverge")
    }
    assert(errs(100L) > (0L until 40L).map(errs).max)
  }

  test("codeBlockedPairs: planted duplicates pair at distance 0; guards hold") {
    // i stays below the modulus so i*13 mod 23 is injective — no
    // accidental exact duplicates beyond the planted ones
    val base = (0L until 20L).map { i =>
      i -> (0 until 8).map(d => ((i * 13 + d * 7) % 23).toDouble - 11.0)
    }
    // plant two exact duplicate groups
    val vecs = base ++ Seq(100L -> base(3L.toInt)._2, 101L -> base(3L.toInt)._2,
      200L -> base(8L.toInt)._2)
    val pairs = ProductQuant.codeBlockedPairs(df(vecs), "vec_id", "embedding",
      m = 2, subDim = 4, maxL2 = Long.MaxValue, nCodes = 2, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val zero = pairs.filter(_._3 == 0L).map(p => (p._1, p._2)).toSet
    assert(Set((3L, 100L), (3L, 101L), (100L, 101L), (8L, 200L)).subsetOf(zero))
    pairs.foreach { case (a, b, _) => assert(a < b) }
    // maxL2 = 0 keeps only the exact duplicates
    val strict = ProductQuant.codeBlockedPairs(df(vecs), "vec_id", "embedding",
      m = 2, subDim = 4, maxL2 = 0L, nCodes = 2, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict === Set((3L, 100L), (3L, 101L), (100L, 101L), (8L, 200L)))
    // a tiny maxBucket drops every cell (2 codes^2 subspaces = 4 wide cells)
    val guarded = ProductQuant.codeBlockedPairs(df(vecs), "vec_id", "embedding",
      m = 2, subDim = 4, maxL2 = Long.MaxValue, nCodes = 2, lloydIters = 1, maxBucket = 2)
    assert(guarded.count() <= strict.size.toLong)
  }

  test("l2TopK: exact duplicates rank first at distance 0, ties by id") {
    val base = (0L until 15L).map { i =>
      i -> (0 until 4).map(d => ((i * 5 + d) % 9).toDouble / 4.0)
    }
    val q = base(6L.toInt)._2
    val vecs = base ++ Seq(50L -> q)
    val got = ProductQuant.l2TopK(df(vecs), "vec_id", "embedding", q.toArray, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.take(2).toSeq === Seq((6L, 0L), (50L, 0L)))
    assert(got(2)._2 > 0L)
  }

  test("short and null-element vectors are dropped, not mis-encoded") {
    import spark.implicits._
    val good = (0L until 8L).map(i => (i, (0 until 4).map(d => (i + d).toFloat / 10f)))
    val degenerate = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(90L, Seq(0.1f, 0.2f)),                  // short
        org.apache.spark.sql.Row(91L, null),                            // null vector
        org.apache.spark.sql.Row(92L, Seq(0.1f, null, 0.3f, 0.4f)))),   // null element
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    val all = good.toDF("vec_id", "embedding").union(degenerate)
    val rows = ProductQuant.quantizedRows(all, "vec_id", "embedding", m = 2, subDim = 2)
    assert(rows.select("vid").collect().map(_.getLong(0)).sorted.toSeq === (0L until 8L))
  }

  test("adcScoresBatch equals independent single-query probes, one pass") {
    val vecs = (0L until 20L).map { i =>
      i -> (0 until 8).map(d => ((i * 13 + d * 5) % 17).toDouble / 8.0 - 1.0)
    }
    val data = df(vecs)
    val rows = ProductQuant.quantizedRows(data, "vec_id", "embedding", m = 4, subDim = 2)
    val cb = ProductQuant.trainCodebooks(rows, m = 4, subDim = 2, nCodes = 3, lloydIters = 1)
    val queries = Seq(vecs(0)._2.toArray, vecs(7)._2.toArray, vecs(13)._2.toArray)
    val batch = ProductQuant.adcScoresBatch(data, "vec_id", "embedding", cb, queries, m = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val singles = queries.zipWithIndex.flatMap { case (q, qi) =>
      ProductQuant.adcScores(data, "vec_id", "embedding", cb, q, m = 4)
        .collect().map(r => (qi.toLong, r.getLong(0)) -> r.getLong(1))
    }.toMap
    assert(batch === singles)
    assert(batch.size === 3 * vecs.size)
    // bounds hold loudly
    intercept[IllegalArgumentException] {
      ProductQuant.adcScoresBatch(data, "vec_id", "embedding", cb, Nil, m = 4)
    }
  }

  test("ivfAdcTopKRefined: full-corpus shortlist equals exact l2TopK; subset of shortlist") {
    val vecs = (0L until 30L).map { i =>
      i -> (0 until 8).map(d => ((i * 11 + d * 7) % 19).toDouble / 9.0 - 1.0)
    }
    val data = df(vecs)
    val query = vecs(0)._2.toArray
    // kShort = corpus size and nProbe = nLists: the shortlist holds every
    // vector, so exact re-rank == brute-force l2TopK rank-for-rank
    val refined = ProductQuant.ivfAdcTopKRefined(data, "vec_id", "embedding", query,
        k = 5, kShort = 30, m = 4, nLists = 4, nProbe = 4, nCodes = 4, lloydIters = 1,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val exact = ProductQuant.l2TopK(data, "vec_id", "embedding", query, k = 5,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(refined.toSeq === exact.toSeq)
    // narrow shortlist: the refined result must be a subset of the ADC
    // shortlist, ranked by exact distance ascending
    val short = ProductQuant.ivfAdcTopK(data, "vec_id", "embedding", query,
        k = 10, m = 4, nLists = 4, nProbe = 2, nCodes = 4, lloydIters = 1,
        excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val narrow = ProductQuant.ivfAdcTopKRefined(data, "vec_id", "embedding", query,
        k = 5, kShort = 10, m = 4, nLists = 4, nProbe = 2, nCodes = 4, lloydIters = 1,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(narrow.map(_._1).forall(short.contains))
    assert(narrow.map(_._2).toSeq === narrow.map(_._2).toSeq.sorted)
    intercept[IllegalArgumentException] {
      ProductQuant.ivfAdcTopKRefined(data, "vec_id", "embedding", query,
        k = 20, kShort = 10, m = 4)
    }
  }
}
