package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("histogram buckets by integer floor-division and clamps the tail") {
    import spark.implicits._
    val df = Seq(5.0, 15.0, 15.5, 25.0, 999.0).toDF("v")
    val out = Stats.histogram(df, "v", bucketWidth = 10L, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (0L, 1L, 500L), (1L, 2L, 3050L), (2L, 1L, 2500L), (3L, 1L, 99900L)))
  }

  test("pearsonExact matches the closed form on a known series") {
    import spark.implicits._
    // y = 2x exactly -> r = 1
    val df = (1 to 10).map(i => (i.toDouble, 2.0 * i)).toDF("x", "y")
    val r = Stats.pearsonExact(df, "x", "y", 1, 1).collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("sx") === 55L)
    assert(r.getAs[Long]("sxy") === 770L)
    assert(math.abs(r.getAs[Long]("corr_x1e9") - 1000000000L) <= 1L)
    // anti-correlated
    val df2 = (1 to 10).map(i => (i.toDouble, -3.0 * i)).toDF("x", "y")
    val r2 = Stats.pearsonExact(df2, "x", "y", 1, 1).collect()(0).getAs[Long]("corr_x1e9")
    assert(math.abs(r2 + 1000000000L) <= 1L)
  }

  test("nulls are excluded from both stats") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)]((1.0, 2.0), (null, 5.0), (3.0, null))
      .toDF("x", "y")
    assert(Stats.pearsonExact(df, "x", "y", 1, 1).collect()(0).getAs[Long]("n") === 1L)
    assert(Stats.histogram(df, "x", 10L, 5).collect().map(_.getLong(1)).sum === 2L)
  }

  test("groupPercentiles: per-group counts, member values, correct medians") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("a", i.toDouble)) ++ (1 to 10).map(i => ("b", i * 1000.0))
    val out = Stats.groupPercentiles(df.toDF("g", "x"), "g", "x", Seq(0.5))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Double](2)))).toMap
    assert(out("a")._1 === 100L && out("b")._1 === 10L)
    // GK at accuracy 1000 on tiny groups is exact, and returns members
    assert(out("a")._2.head === 50.0)
    assert(out("b")._2.head === 5000.0)
  }

  test("groupPercentiles rejects quantiles outside (0,1)") {
    import spark.implicits._
    val df = Seq(("a", 1.0)).toDF("g", "x")
    intercept[IllegalArgumentException] {
      Stats.groupPercentiles(df, "g", "x", Seq(0.5, 1.0))
    }
  }
}
