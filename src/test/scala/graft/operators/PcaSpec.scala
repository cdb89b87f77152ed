package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PcaSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def vecsDf(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("vec_id", "embedding")
  }

  // deterministic pseudo-random stream (no Random seed drift across scala versions)
  private def noise(i: Int, j: Int): Double = {
    val h = (i.toLong * 2654435761L + j.toLong * 40503L + 12345L) & 0xffffffL
    h.toDouble / 0xffffffL.toDouble - 0.5
  }

  test("jacobiEigen solves a known 2x2 exactly") {
    // [[2, 1], [1, 2]] -> eigenvalues 3, 1; vectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (values, vectors) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(values(0) - 3.0) < 1e-12 && math.abs(values(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(vectors(0)(0) - s) < 1e-12 && math.abs(vectors(0)(1) - s) < 1e-12)
    assert(math.abs(math.abs(vectors(1)(0)) - s) < 1e-12 &&
      math.abs(vectors(1)(0) + vectors(1)(1)) < 1e-12)
  }

  test("jacobiEigen: eigenvalues sum to trace, vectors orthonormal, A v = λ v") {
    val d = 16
    // symmetric with dominant structure: M = B^T B for a deterministic B
    val b = Array.tabulate(d, d)((i, j) => noise(i, j) + (if (i == j) 1.5 else 0.0))
    val m = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => b(k)(i) * b(k)(j)).sum)
    val (values, vectors) = Pca.jacobiEigen(m)
    val trace = (0 until d).map(i => m(i)(i)).sum
    assert(math.abs(values.sum - trace) < 1e-9 * math.abs(trace))
    assert(values.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "values must be descending")
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => vectors(i)(k) * vectors(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"orthonormality ($i,$j)")
    }
    for (i <- 0 until d) {
      val av = (0 until d).map(r => (0 until d).map(c => m(r)(c) * vectors(i)(c)).sum)
      val resid = av.zipWithIndex.map { case (x, r) => x - values(i) * vectors(i)(r) }
        .map(math.abs).max
      assert(resid < 1e-8 * math.max(math.abs(values(i)), 1.0), s"A v = λ v for component $i")
    }
  }

  test("gram state is exact and partitioning-invariant") {
    val d = 5
    val rows = (0 until 200).map(i => (i.toLong, (0 until d).map(j => noise(i, j) * 0.4)))
    val df = vecsDf(rows)
    val flat = Pca.gram(df, "embedding", d, grid = 1000L).collect()(0).getSeq[Long](0)
    val st = Pca.stateOf(flat, d, 1000L)
    // brute-force the same integer moments
    val q = rows.map(_._2.map(x => math.round(x * 1000.0)).toArray)
    assert(st.n === 200L)
    for (i <- 0 until d) assert(st.sums(i) === q.map(_(i)).sum, s"sum $i")
    for (i <- 0 until d; j <- i until d)
      assert(st.gramAt(i, j) === q.map(v => v(i) * v(j)).sum, s"gram ($i,$j)")
    // a different partitioning lands on the identical state
    val flat7 = Pca.gram(df.repartition(7), "embedding", d, grid = 1000L)
      .collect()(0).getSeq[Long](0)
    assert(flat7 === flat)
  }

  test("principal components recover a planted direction and project() matches the variance") {
    val d = 8
    // planted: dominant variance along (1,1,...,1)/sqrt(d), small isotropic noise
    val dir = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    val rows = (0 until 400).map { i =>
      val t = 3.0 * (noise(i, 97) * 2.0) // spread along the planted direction
      (i.toLong, (0 until d).map(j => t * dir(j) + 0.05 * noise(i, j)))
    }
    val df = vecsDf(rows)
    val (values, comps) = Pca.principalComponents(df, "embedding", d, k = 2, grid = 1000L)
    // top component aligns with the planted direction
    val align = math.abs(comps(0).zip(dir).map { case (a, b) => a * b }.sum)
    assert(align > 0.999, s"top component alignment $align")
    // λ1 dominates and explains almost everything
    assert(values(0) > 20.0 * values(1), s"spectrum ${values.take(3).mkString(",")}")
    // projection onto comp1: integer outputs whose empirical variance
    // matches λ1 (grid² scale) within 2%
    val proj = Pca.project(df, "vec_id", "embedding", Array(comps(0)), d)
      .select(col("proj")(0).as("y")).collect().map(_.getLong(0).toDouble)
    val meanY = proj.sum / proj.length
    val varY = proj.map(y => (y - meanY) * (y - meanY)).sum / proj.length
    // vec grid 1e6 × comp grid 1e6 → proj scales by 1e12, variance by 1e24
    val expected = values(0) * 1e24
    assert(math.abs(varY - expected) / expected < 0.02,
      s"projected variance $varY vs λ1·1e12 = $expected")
  }

  test("gram filters short and null-element vectors; empty input is loud at stateOf") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Float](1.0f, 2.0f)),          // too short for dim=3
      (2L, Seq[java.lang.Float](1.0f, null, 3.0f)),    // null element
      (3L, Seq[java.lang.Float](1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val flat = Pca.gram(df, "embedding", 3, grid = 1000L).collect()(0).getSeq[Long](0)
    assert(Pca.stateOf(flat, 3, 1000L).n === 1L, "only the one clean vector counts")
    // every row invalid -> n = 0 state -> stateOf throws rather than
    // handing back a basis built from nothing
    val none = Pca.gram(df.where(col("vec_id") === 2L), "embedding", 3, grid = 1000L)
      .collect()(0).getSeq[Long](0)
    intercept[IllegalArgumentException] { Pca.stateOf(none, 3, 1000L) }
  }

  test("the bare aggregate (no guard) rejects ragged vectors loudly") {
    import spark.implicits._
    val df = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("q")
    val err = intercept[Exception] {
      df.agg(graft.plans.GramMatrixAgg.gramSketch(col("q"), 3).as("g")).collect()
    }
    assert(err.getMessage != null)
  }

  test("stateOf validates the flat layout") {
    intercept[IllegalArgumentException] { Pca.stateOf(Seq(1L, 2L, 3L), 4, 1000L) }
  }

  test("whitenComponents: projections come out unit-variance and decorrelated") {
    val d = 6
    // anisotropic data: per-dimension scales spanning 30x
    val scales = Array(3.0, 1.0, 0.6, 0.3, 0.2, 0.1)
    val rows = (0 until 500).map(i =>
      (i.toLong, (0 until d).map(j => scales(j) * noise(i, j * 7 + 1))))
    val df = vecsDf(rows)
    val flat = Pca.gram(df, "embedding", d, 10000L).collect()(0).getSeq[Long](0)
    val (values, vectors) = Pca.jacobiEigen(Pca.stateOf(flat, d, 10000L).covariance)
    val w = Pca.whitenComponents(values, vectors, k = 3)
    assert(w.length === 3)
    val proj = Pca.project(df, "vec_id", "embedding", w, d)
      .collect().map(_.getSeq[Long](1).map(_.toDouble).toArray)
    val n = proj.length.toDouble
    for (a <- 0 until 3; b <- a until 3) {
      val ma = proj.map(_(a)).sum / n
      val mb = proj.map(_(b)).sum / n
      val cov = (proj.map(p => p(a) * p(b)).sum / n - ma * mb) / 1e24
      if (a == b) assert(math.abs(cov - 1.0) < 0.02, s"var($a) = $cov")
      else assert(math.abs(cov) < 0.02, s"cov($a,$b) = $cov")
    }
    // guards
    intercept[IllegalArgumentException] { Pca.whitenComponents(values, vectors, 0) }
    intercept[IllegalArgumentException] { Pca.whitenComponents(values, vectors, 3, eps = 0.0) }
    // non-positive eigenvalues are dropped, never amplified
    assert(Pca.whitenComponents(Array(1.0, -1e-18), Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      k = 2).length === 1)
  }

  test("gramByGroup equals independent gram runs per group") {
    import org.apache.spark.sql.functions.col
    val d = 4
    val rows = (0 until 120).map(i => (i.toLong, (0 until d).map(j => noise(i, j))))
    val df = vecsDf(rows).withColumn("grp", col("vec_id") % 3)
    val byGroup = Pca.gramByGroup(df, "grp", "embedding", d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (g <- 0L until 3L) {
      val solo = Pca.gram(df.where(col("grp") === g), "embedding", d)
        .collect()(0).getSeq[Long](0)
      assert(byGroup(g) === solo, s"group $g state")
    }
  }

  test("mergeStates: shard states sum to EXACTLY the single-pass state") {
    import org.apache.spark.sql.functions.col
    val d = 6
    val rows = (0 until 200).map(i => (i.toLong, (0 until d).map(j => noise(i, j))))
    val df = vecsDf(rows)
    val shards = Pca.gramByGroup(
      df.withColumn("shard", col("vec_id") % 5), "shard", "embedding", d)
    val merged = Pca.mergeStates(shards.select(col("g")))
      .collect()(0).getSeq[Long](0)
    val whole = Pca.gram(df, "embedding", d).collect()(0).getSeq[Long](0)
    assert(merged === whole)
    // mixed-dimension states must throw, never sum index-by-index into a
    // silently wrong basis
    val other = Pca.gram(vecsDf((0 until 10).map(i =>
      (i.toLong, (0 until 3).map(j => noise(i, j))))), "embedding", 3)
    val err = intercept[IllegalArgumentException] {
      Pca.mergeStates(shards.select(col("g")).unionByName(other.select(col("g"))))
    }
    assert(err.getMessage.contains("mixed state lengths"))
  }

  test("principalCosines: identical bases → 1, orthogonal → 0, subspace rotation-invariant") {
    import org.apache.spark.sql.functions.col
    val d = 4
    // axis-pure shards: A varies on e0 (±2) and e1 (±1); B on e2/e3; C is
    // A with its two axes SWAPPED (same top-2 subspace, different order)
    def axes(a0: Int, a1: Int): Seq[(Long, Seq[Double])] =
      (0 until 40).map { i =>
        val v = Array.fill(d)(0.0)
        v(a0) = if (i % 2 == 0) 2.0 else -2.0
        v(a1) = if (i % 3 == 0) 1.0 else -1.0
        (i.toLong, v.toSeq)
      }
    def st(rows: Seq[(Long, Seq[Double])]) = Pca.stateOf(
      Pca.gram(vecsDf(rows), "embedding", d).collect()(0).getSeq[Long](0), d, 1000L)
    val sA = st(axes(0, 1))
    val sB = st(axes(2, 3))
    val sC = st(axes(1, 0)) // e1 now dominant: top-1 flips, top-2 span identical
    val same = Pca.principalCosines(sA, sA, 2)
    assert(same.forall(c => math.abs(c - 1.0) < 1e-9))
    val orth = Pca.principalCosines(sA, sB, 2)
    assert(orth.forall(c => c < 1e-9), s"disjoint axes must be orthogonal: ${orth.toSeq}")
    // top-1 direction moved (cos ~ 0) but the top-2 SUBSPACE is identical
    // (both cosines 1) — exactly the k-sensitivity a drift monitor needs
    assert(Pca.principalCosines(sA, sC, 1)(0) < 1e-9)
    val sub = Pca.principalCosines(sA, sC, 2)
    assert(sub.forall(c => math.abs(c - 1.0) < 1e-9), s"swapped axes span the same plane: ${sub.toSeq}")
    // layout guard
    intercept[IllegalArgumentException] {
      Pca.principalCosines(sA, Pca.stateOf(
        Pca.gram(vecsDf(axes(0, 1)), "embedding", d, grid = 10L)
          .collect()(0).getSeq[Long](0), d, 10L), 1)
    }
  }
}
