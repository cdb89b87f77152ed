package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class HitsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def frame(edges: (Long, Long)*) = {
    import spark.implicits._
    edges.toSeq.toDF("src", "dst")
  }
  private def nodesOf(ids: Long*) = {
    import spark.implicits._
    ids.toSeq.toDF("node")
  }

  test("star graph: the hub points, the center authorizes; both pin to scale") {
    // 1..4 all point at 0; 5 points at 1..4 (a directory page)
    val edges = frame(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 1L, 5L -> 2L, 5L -> 3L, 5L -> 4L)
    val out = Hits.scores(edges, nodesOf(0L, 1L, 2L, 3L, 4L, 5L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L)._1 === 1000000L) // max authority pins to scale
    assert(out.values.map(_._2).max === out(5L)._2) // 5 is the best hub
    assert(out(5L)._1 === 0L) // nothing points at the directory
    assert(out(0L)._2 === 0L) // the center points at nothing
    // the 1..4 ring: symmetric, identical scores
    assert(Set(out(1L), out(2L), out(3L), out(4L)).size === 1)
  }

  test("determinism: identical runs produce identical grids") {
    val edges = frame((0L until 30L).flatMap(i =>
      Seq(i -> (i * 7 + 3) % 30, i -> (i * 11 + 5) % 30)): _*)
    val nodes = nodesOf(0L until 30L: _*)
    val a = Hits.scores(edges, nodes).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = Hits.scores(edges, nodes).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("guards: empty node set and overflow bound throw") {
    val e = frame(1L -> 2L)
    assert(intercept[IllegalArgumentException] {
      Hits.scores(e, nodesOf())
    }.getMessage.contains("at least one node"))
    assert(intercept[IllegalArgumentException] {
      Hits.scores(e, nodesOf(1L, 2L), scale = 4000000000L)
    }.getMessage.contains("overflow"))
  }

  test("isolated nodes hold 0/0; null edges are dropped") {
    import spark.implicits._
    val edges = Seq((Some(1L), Some(2L)), (None, Some(9L)), (Some(9L), None))
      .toDF("src", "dst")
    val out = Hits.scores(edges, nodesOf(1L, 2L, 9L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(9L) === ((0L, 0L)))
    assert(out(2L)._1 === 1000000L)
    assert(out(1L)._2 === 1000000L)
  }
}
