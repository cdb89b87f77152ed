package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("binned range join equals the naive BETWEEN theta-join") {
    import spark.implicits._
    val points = (0 until 500).map(i => (i.toLong, (i * 7 % 100).toDouble)).toDF("pid", "v")
    val intervals = (0 until 60).map { j =>
      val lo = (j * 5 % 90).toDouble
      (j.toLong, lo, lo + (j % 13))
    }.toDF("iid", "lo", "hi")

    val naive = points.crossJoin(intervals)
      .where($"v".between($"lo", $"hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (binWidth <- Seq(1.0, 4.0, 16.0, 1000.0)) {
      val binned = RangeJoin.joinPointInInterval(points, "v", intervals, "lo", "hi", binWidth)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned === naive, s"binWidth=$binWidth")
    }
  }

  test("each true pair is emitted exactly once (no dedup needed)") {
    import spark.implicits._
    val points = Seq((1L, 10.0)).toDF("pid", "v")
    val intervals = Seq((1L, 0.0, 100.0)).toDF("iid", "lo", "hi") // spans many bins
    val out = RangeJoin.joinPointInInterval(points, "v", intervals, "lo", "hi", 5.0)
    assert(out.count() === 1, "interval covering many bins still matches the point once")
  }

  test("inverted and boundary intervals behave: empty dropped, bounds inclusive") {
    import spark.implicits._
    val points = Seq((1L, 5.0), (2L, 10.0)).toDF("pid", "v")
    val intervals = Seq(
      (1L, 5.0, 10.0),  // both points on the boundary -> both match
      (2L, 9.0, 3.0)    // inverted -> dropped
    ).toDF("iid", "lo", "hi")
    val out = RangeJoin.joinPointInInterval(points, "v", intervals, "lo", "hi", 2.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 1L), (2L, 1L)))
  }

  test("plan: equi-join on the bin, not a nested-loop theta join") {
    import spark.implicits._
    val points = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("pid", "v")
    val intervals = (0 until 10).map(j => (j.toLong, j * 10.0, j * 10.0 + 9)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.joinPointInInterval(points, "v", intervals, "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"must not nested-loop:\n$plan")
  }

  test("interval overlap join equals brute force, each pair exactly once (incl. negatives)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val a = (0 until 60).map { i =>
      val lo = rnd.nextInt(200) - 100L; (i.toLong, lo, lo + rnd.nextInt(25))
    }
    val b = (0 until 60).map { i =>
      val lo = rnd.nextInt(200) - 100L; (1000L + i, lo, lo + rnd.nextInt(25))
    }
    val expected = (for {
      (ai, alo, ahi) <- a; (bi, blo, bhi) <- b
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)).toSet
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val out = RangeJoin.joinIntervalOverlap(
        a.toDF("aid", "alo", "ahi"), "alo", "ahi",
        b.toDF("bid", "blo", "bhi"), "blo", "bhi", w)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(out.length === out.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(out.toSet === expected, s"binWidth=$w")
    }
  }

  test("interval overlap join: inverted intervals dropped, disjoint column names enforced") {
    import spark.implicits._
    val a = Seq((1L, 10L, 5L)).toDF("aid", "alo", "ahi") // inverted
    val b = Seq((2L, 0L, 100L)).toDF("bid", "blo", "bhi")
    assert(RangeJoin.joinIntervalOverlap(a, "alo", "ahi", b, "blo", "bhi", 10L).count() === 0)
    val e = intercept[IllegalArgumentException] {
      RangeJoin.joinIntervalOverlap(a, "alo", "ahi",
        Seq((2L, 0L, 1L)).toDF("aid", "blo", "bhi"), "blo", "bhi", 10L)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("interval overlap plan is an equi-join on the bin") {
    import spark.implicits._
    val a = (0 until 50).map(i => (i.toLong, i * 3L, i * 3L + 10)).toDF("aid", "alo", "ahi")
    val b = (0 until 50).map(i => (500L + i, i * 2L, i * 2L + 8)).toDF("bid", "blo", "bhi")
    val plan = RangeJoin.joinIntervalOverlap(a, "alo", "ahi", b, "blo", "bhi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"must not nested-loop:\n$plan")
  }
}
