package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TopKAggregateSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("top-k per group matches the window-rank formulation incl. ties") {
    import spark.implicits._
    // group a: scores 5,5,3,1 with a tie on 5 -> ids 10,11 win, then 12
    // group b: fewer rows than k -> all kept, rank order preserved
    val df = Seq(
      ("a", 5.0, 11L), ("a", 5.0, 10L), ("a", 3.0, 12L), ("a", 1.0, 13L),
      ("b", 2.0, 20L), ("b", 9.0, 21L)
    ).toDF("g", "s", "id").repartition(4) // force partial buffers + merge
    val out = df.groupBy($"g")
      .agg(TopKAggregate.topKByScore($"s", $"id", 3).as("top"))
      .select($"g", $"top.id".as("ids"), $"top.score".as("scores"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[collection.Seq[Long]]("ids").toSeq, r.getAs[collection.Seq[Double]]("scores").toSeq)).toMap
    assert(out("a") === (Seq(10L, 11L, 12L), Seq(5.0, 5.0, 3.0)))
    assert(out("b") === (Seq(21L, 20L), Seq(9.0, 2.0)))
  }

  test("null scores and ids are ignored; empty group yields empty array") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0), Some(1L)), ("a", None, Some(2L)), ("a", Some(3.0), None),
      ("b", None, None)
    ).toDF("g", "s", "id")
    val out = df.groupBy($"g")
      .agg(TopKAggregate.topKByScore($"s", $"id", 2).as("top"))
      .select($"g", size($"top").as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out === Map("a" -> 1, "b" -> 0))
  }

  test("partial aggregation appears in the plan (ObjectHashAggregate, partial_)") {
    import spark.implicits._
    val df = spark.range(1000).select(
      (col("id") % 7).cast("string").as("g"), rand(7).as("s"), col("id").as("i"))
    val agg = df.groupBy($"g").agg(TopKAggregate.topKByScore($"s", $"i", 5).as("top"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan.take(500))
    assert(plan.contains("partial_graft_top_k_by_score"), "expected a partial (map-side) phase")
  }
}
