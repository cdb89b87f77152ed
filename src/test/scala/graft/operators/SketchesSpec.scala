package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SketchesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import org.apache.spark.sql.DataFrame

  private def keysDf(keys: Seq[String]): DataFrame = {
    import spark.implicits._
    keys.toDF("k")
  }

  test("CMS never underestimates, and is exact for a collision-free toy set") {
    val data = Seq.fill(100)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma")
    val df = keysDf(scala.util.Random.shuffle(data))
    val cells = Sketches.cmsAggregate(df, "k")
    val est = Sketches.cmsEstimates(cells, keysDf(Seq("alpha", "beta", "gamma")), "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 100L && est("beta") >= 7L && est("gamma") >= 1L)
    // 3 keys in 4x1024 cells: a same-row collision among all four rows is
    // astronomically unlikely; equality is the expected outcome
    assert(est === Map("alpha" -> 100L, "beta" -> 7L, "gamma" -> 1L))
  }

  test("CMS cell table is bounded by depth x width regardless of input") {
    val df = keysDf((1 to 5000).map(i => s"key$i"))
    val n = Sketches.cmsAggregate(df, "k", depth = 4, width = 64).count()
    assert(n <= 4L * 64L)
  }

  test("CMS estimate for a key hashed only to empty cells is zero") {
    val cells = Sketches.cmsAggregate(keysDf(Seq("only")), "k")
    val est = Sketches.cmsEstimates(cells, keysDf(Seq("absent-key-xyz")), "k")
      .collect().head.getLong(1)
    assert(est === 0L)
  }

  test("width/depth contracts are enforced") {
    intercept[IllegalArgumentException] {
      Sketches.cmsAggregate(keysDf(Seq("a")), "k", width = 1000)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsAggregate(keysDf(Seq("a")), "k", depth = 11)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(keysDf(Seq("a")), "k", m = 100)
    }
  }

  test("HLL registers are duplicate-insensitive (max-aggregate, not count)") {
    val once = keysDf((1 to 500).map(i => s"v$i"))
    val thrice = once.unionAll(once).unionAll(once)
    val a = Sketches.hllRegisters(once, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Sketches.hllRegisters(thrice, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
  }

  test("HLL estimate lands within 10% of the true cardinality at n=10000") {
    val n = 10000
    val regs = Sketches.hllRegisters(keysDf((1 to n).map(i => s"item-$i")), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val est = Sketches.hllEstimate(regs, 1024)
    assert(math.abs(est - n) / n.toDouble < 0.10,
      s"HLL estimate $est vs true $n (m=1024, rse ~3.2%)")
  }

  test("HLL small-range correction: tiny cardinalities stay accurate") {
    val regs = Sketches.hllRegisters(keysDf((1 to 30).map(i => s"x$i")), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val est = Sketches.hllEstimate(regs, 1024)
    assert(math.abs(est - 30) <= 3, s"linear-counting regime estimate $est vs 30")
  }
}
