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
}
