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

  test("rollingAnomalies flags a spike against its trailing baseline only") {
    import spark.implicits._
    // user 1: ten 10.00s, then 50.00 (spike), then 10.00 again
    val rows = (1 to 10).map(i => (1L, i.toLong, 10.0)) ++
      Seq((1L, 11L, 50.0), (1L, 12L, 10.0))
    val df = rows.toDF("u", "seq", "v")
    val out = Stats.rollingAnomalies(df, Seq("u"), Seq("seq"), "v",
        window = 20, minPeriods = 4, zThreshold = 3)
      .collect().map(r => r.getAs[Long]("seq") ->
        ((r.getAs[Long]("n_baseline"), r.getAs[Long]("flagged")))).toMap
    // constant baseline: zero variance, so ANY deviation exceeds it
    assert(out(11L) === ((10L, 1L)))
    // the early rows never have minPeriods of history
    (1 to 4).foreach(i => assert(out(i.toLong)._2 === 0L, s"row $i"))
    // equal-to-baseline rows have lhs = 0, never flagged
    assert(out(10L)._2 === 0L)
    // the row AFTER the spike compares against a baseline containing the
    // spike - higher variance, 10.00 is within 3 sigma of it
    assert(out(12L)._2 === 0L)
  }

  test("rollingAnomalies matches the float z-score on a noisy series") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = Vector.fill(200)(50.0 + rnd.nextInt(2000) / 100.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }.toDF("u", "seq", "v")
    val w = 20; val mp = 8; val t = 3
    val out = Stats.rollingAnomalies(df, Seq("u"), Seq("seq"), "v", w, mp, t)
      .collect().map(r => r.getAs[Long]("seq") -> r.getAs[Long]("flagged")).toMap
    // reference: naive float z-score over the same trailing window
    val cents = vals.map(v => math.round(v * 100))
    for (i <- vals.indices) {
      val baseline = cents.slice(math.max(0, i - w), i)
      val expect =
        if (baseline.size < mp) 0L
        else {
          val n = baseline.size.toDouble
          val mean = baseline.sum / n
          val variance = baseline.map(c => (c - mean) * (c - mean)).sum / (n - 1)
          if ((cents(i) - mean) * (cents(i) - mean) > t * t * variance) 1L else 0L
        }
      assert(out(i.toLong) === expect, s"row $i")
    }
  }

  test("rollingAnomalies validates window parameters") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1.0)).toDF("u", "seq", "v")
    intercept[IllegalArgumentException] {
      Stats.rollingAnomalies(df, Seq("u"), Seq("seq"), "v", 10, 1, 3)
    }
    intercept[IllegalArgumentException] {
      Stats.rollingAnomalies(df, Seq("u"), Seq("seq"), "v", 4, 8, 3)
    }
  }

  test("winsorize clamps into the per-group percentile band, nulls pass through") {
    import spark.implicits._
    // group a: 1..100 -> p10 = 10.9, p90 = 90.1 (linear interpolation)
    val df = ((1 to 100).map(i => ("a", Some(i.toDouble))) :+ (("a", None)))
      .toDF("g", "v")
    val out = Stats.winsorize(df, "g", "v", 0.10, 0.90)
      .collect().map(r => (Option(r.get(1)).map(_.toString.toDouble),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    for ((v, w) <- out) (v, w) match {
      case (None, ww) => assert(ww.isEmpty)
      case (Some(x), Some(ww)) =>
        assert(math.abs(ww - math.min(math.max(x, 10.9), 90.1)) < 1e-9)
      case bad => fail(s"unexpected $bad")
    }
  }

  test("winsorize clamps the NULL group too (null-safe join)") {
    import spark.implicits._
    val df = (Seq.tabulate(10)(i => (Option("a"), (i + 1).toDouble)) ++
      Seq.tabulate(10)(i => (Option.empty[String], (i + 1) * 100.0))).toDF("g", "v")
    val out = Stats.winsorize(df, "g", "v", 0.10, 0.90)
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1), r.getDouble(2)))
    // the null group's own band is [190, 910]; 1000 must be clamped
    val nullRows = out.filter(_._1.isEmpty)
    assert(nullRows.nonEmpty)
    assert(nullRows.forall { case (_, _, w) => w >= 190.0 && w <= 910.0 })
    assert(nullRows.exists { case (_, v, w) => v === 1000.0 && w === 910.0 })
  }

  test("equiDepthBucketize on an empty frame returns empty, not NPE") {
    import spark.implicits._
    val df = Seq.empty[Double].toDF("v")
    assert(Stats.equiDepthBucketize(df, "v", 4).count() === 0)
  }

  test("winsorize approx path stays within the band and agrees on interior values") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("a", i.toDouble)).toDF("g", "v")
    val out = Stats.winsorize(df, "g", "v", 0.05, 0.95, exact = false)
      .select("v", "v_w").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // interior values untouched; tails clamped to a bound near the true one
    for ((v, w) <- out) {
      if (v > 100 && v < 900) assert(w === v)
      assert(w >= 40 && w <= 960) // GK accuracy 10000 on 1000 rows ~ exact
    }
  }

  test("equiDepthBucketize: k balanced buckets, boundary ties go low, nulls null") {
    import spark.implicits._
    val df = ((1 to 80).map(i => Some(i.toDouble)) :+ None).toDF("v")
    val out = Stats.equiDepthBucketize(df, "v", k = 4)
      .collect().map(r => (Option(r.get(0)).map(_.toString.toDouble),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(out.collect { case (None, b) => b }.head.isEmpty)
    val byBucket = out.collect { case (Some(v), Some(b)) => (b, v) }.groupBy(_._1)
    assert(byBucket.keySet === Set(0L, 1L, 2L, 3L))
    assert(byBucket.values.forall(_.length === 20)) // 1..80 splits evenly
    // every value in bucket i is below every value in bucket i+1
    val maxes = (0L to 3L).map(b => byBucket(b).map(_._2).max)
    assert(maxes === maxes.sorted)
  }

  test("madOutliers flags only the far spike; a mean-based band would drown") {
    import spark.implicits._
    // baseline 10.00 +- 0.02, one 1e6 spike: median/MAD ignore the spike,
    // so exactly the spike (and nothing near the baseline) flags
    val rows = (1 to 99).map(i => ("g", 10.0 + (i % 5 - 2) * 0.01)) :+ ("g" -> 1000000.0)
    val out = Stats.madOutliers(rows.toDF("g", "v"), "g", "v")
      .select("v", "flagged").collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.filter(_._2 == 1L).map(_._1).toSet === Set(1000000.0))
  }

  test("madOutliers doubled-grid rule matches a direct float MAD on odd data") {
    import spark.implicits._
    val vals = Seq(1.0, 3.0, 3.0, 4.0, 7.0, 7.5, 50.0)
    val out = Stats.madOutliers(vals.map("g" -> _).toDF("g", "v"), "g", "v", threshold = 3)
      .select("v", "med2", "mad4", "flagged").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val med = 4.0 // median of the 7 values
    // deviations |v - 4| = {3,1,1,0,3,3.5,46} -> MAD = 3.0 (= 300 cents)
    assert(out.head._2 === (2 * med * 100).toLong) // med2 = 800
    assert(out.head._3 === 2 * 2 * 300L)           // mad4 = 1200
    out.foreach { case (v, _, _, f) =>
      assert(f === (if (math.abs(v - med) > 3 * 3.0) 1L else 0L))
    }
    assert(out.count(_._4 == 1L) === 1) // only 50.0
  }

  test("percentRankCalibrate matches percent_rank with min-rank ties, never sorts the corpus") {
    import spark.implicits._
    val df = Seq(
      ("a", 10L), ("a", 20L), ("a", 20L), ("a", 30L), // ties share min rank
      ("b", 5L),                                      // singleton -> 0
      ("c", 1L), ("c", 2L)).toDF("src", "score")
    val out = Stats.percentRankCalibrate(df, "src", "score")
    val got = out.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // group a (n=4): before = {10:0, 20:1, 30:3} -> 0, 3333, 10000
    assert(got(("a", 10L)) === 0L)
    assert(got(("a", 20L)) === 3333L)
    assert(got(("a", 30L)) === 10000L)
    assert(got(("b", 5L)) === 0L)
    assert(got(("c", 1L)) === 0L && got(("c", 2L)) === 10000L)
    // the plan must window over the HISTOGRAM, not the input: the only
    // sort feeding a window is downstream of the (group, value) aggregate
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a histogram window, plan:\n$plan")
  }

  test("percentRankCalibrate: null scores get null rank, null groups calibrate too") {
    import spark.implicits._
    val df = Seq((Some("a"), Some(1L)), (Some("a"), None), (None, Some(2L)), (None, Some(4L)))
      .toDF("src", "score")
    val out = Stats.percentRankCalibrate(df, "src", "score").collect()
      .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getLong(1))) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out((Some("a"), None)) === None)
    assert(out((None, Some(2L))) === Some(0L))
    assert(out((None, Some(4L))) === Some(10000L))
  }

  test("madOutliers approx path agrees with exact on a clean spike case") {
    import spark.implicits._
    val rows = (1 to 199).map(i => ("g", 50.0 + (i % 3) * 0.01)) :+ ("g" -> 9999.0)
    def flagged(exact: Boolean) =
      Stats.madOutliers(rows.toDF("g", "v"), "g", "v", exact = exact)
        .where(org.apache.spark.sql.functions.col("flagged") === 1L)
        .select("v").collect().map(_.getDouble(0)).toSet
    // GK at accuracy 10000 on 200 rows is effectively exact; both paths
    // must isolate the one spike
    assert(flagged(exact = true) === Set(9999.0))
    assert(flagged(exact = false) === Set(9999.0))
  }

  test("madOutliers: null values never flag, constant group flags nothing") {
    import spark.implicits._
    val rows = Seq(("g", Some(5.0)), ("g", Some(5.0)), ("g", None),
      ("c", Some(2.0)), ("c", Some(2.0)))
    val out = Stats.madOutliers(rows.toDF("g", "v"), "g", "v")
      .select("g", "flagged").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.forall(_._2 == 0L))
  }
}
