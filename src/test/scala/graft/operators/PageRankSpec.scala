package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PageRankSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def ranksOf(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    PageRank.ranks(edges.toDF("src", "dst"), nodes.toDF("node"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("fixed-point ranks match a scalar reference on a small digraph") {
    // 0 -> 1, 0 -> 2, 1 -> 2, 2 -> 0  (classic 3-node example)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L))
    val nodes = Seq(0L, 1L, 2L)
    val got = ranksOf(edges, nodes, iters = 10)

    // scalar recompute with the same integer floor arithmetic
    val n = 3L
    val scale = 1000000000000L
    val teleport = (scale * 15L / 100L) / n
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> scale / n).toMap
    (1 to 10).foreach { _ =>
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        85L * r(s) / (100L * outdeg(s))
      }.sum).toMap
      r = nodes.map(v => v -> (teleport + in.getOrElse(v, 0L))).toMap
    }
    assert(got === r)
    // 2 collects from both 0 and 1: highest rank; sink-free graph
    assert(got(2L) > got(0L) && got(0L) > got(1L))
  }

  test("zero-in-degree nodes settle at the teleport floor") {
    val got = ranksOf(Seq((0L, 1L)), Seq(0L, 1L, 9L), iters = 3)
    val teleport = (1000000000000L * 15L / 100L) / 3L
    assert(got(9L) === teleport)
    assert(got(1L) > got(9L))
  }

  test("iters=0 returns the uniform start; null edges and nodes dropped") {
    import spark.implicits._
    val edges = Seq((Some(0L), Some(1L)), (None, Some(1L)), (Some(0L), None))
      .toDF("src", "dst")
    val nodes = Seq(Some(0L), Some(1L), None).toDF("node")
    val got = PageRank.ranks(edges, nodes, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 500000000000L, 1L -> 500000000000L))
  }

  test("checkpointing rounds produce identical ranks (lineage-only change)") {
    val edges = (0L until 20L).flatMap(i => Seq((i, (i * 7 + 3) % 20), (i, (i * 11 + 5) % 20)))
    val nodes = (0L until 20L)
    val a = ranksOf(edges, nodes, iters = 7) // crosses the checkpointEvery=5 boundary
    import spark.implicits._
    val b = PageRank.ranks(edges.toDF("src", "dst"), nodes.toDF("node"),
      iters = 7, checkpointEvery = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("warm-start from the k-round state continues the exact same chain") {
    import spark.implicits._
    val edges = (0L until 20L).flatMap(i => Seq((i, (i * 7 + 3) % 20), (i, (i * 11 + 5) % 20)))
    val nodes = (0L until 20L)
    val e = edges.toDF("src", "dst"); val n = nodes.toDF("node")
    val r6 = PageRank.ranks(e, n, iters = 6)
    val warm = PageRank.ranksFrom(e, n, Some(r6), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm === ranksOf(edges, nodes, iters = 10))
  }

  test("warm-start: nodes missing from the stored vector start at the cold rank") {
    import spark.implicits._
    val e = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val n = Seq(0L, 1L).toDF("node")
    // stored vector only knows node 0; node 1 must fall back to scale/n
    val partial = Seq((0L, 123456789L)).toDF("node", "rank")
    val warm0 = PageRank.ranksFrom(e, n, Some(partial), iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm0 === Map(0L -> 123456789L, 1L -> 500000000000L))
  }

  test("ranksFrom(None) is ranks") {
    import spark.implicits._
    val edges = (0L until 12L).map(i => (i, (i * 5 + 1) % 12))
    val e = edges.toDF("src", "dst"); val n = (0L until 12L).toDF("node")
    val a = PageRank.ranks(e, n, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.ranksFrom(e, n, None, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
