package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TrianglesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def count(edges: Seq[(Long, Long)], maxDeg: Int = 100000) = {
    import spark.implicits._
    val r = Triangles.report(edges.toDF("src", "dst"), maxDeg).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("hand-computed: K4 has 4 triangles; adding a pendant edge changes nothing") {
    // complete graph on {1,2,3,4}: 6 edges, C(4,3)=4 triangles,
    // ordered wedges a<b<c: every of the 4 vertex triples has its one
    // ordered wedge present (both (a,b),(b,c) in K4) -> 4 wedges... plus
    // none others (only 4 triples exist on 4 vertices) -> 4
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(count(k4) === ((6L, 4L, 4L)))
    // pendant (4,99) opens three new wedges (x,4,99) but closes none
    assert(count(k4 :+ (4L -> 99L)) === ((7L, 7L, 4L)))
  }

  test("orientation kills duplicates: reversed, repeated, and self-loop edges") {
    // triangle 1-2-3 given with reversals, duplicates and a self-loop:
    // still exactly 3 oriented edges, 1 wedge, 1 triangle
    val messy = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 1L, 1L -> 3L, 2L -> 2L)
    assert(count(messy) === ((3L, 1L, 1L)))
  }

  test("open wedge counts but does not close") {
    // path 1-2-3 (no closing edge): one ordered wedge, zero triangles
    assert(count(Seq(1L -> 2L, 2L -> 3L)) === ((2L, 1L, 0L)))
  }

  test("wedge-degree guard fails loudly on a hub") {
    val star = (2L to 30L).map(i => 1L -> i)
    val e = intercept[Exception](count(star, maxDeg = 10))
    assert(e.getMessage != null && e.getMessage.contains("wedge degree"),
      s"got: ${e.getMessage}")
  }

  test("guard also catches a high-IN-degree hub (wedge volume is in*out)") {
    // node 100 is the HI side of every oriented edge: out-degree 0,
    // in-degree 29 — an out-degree-only guard would wave this through
    val inStar = (2L to 30L).map(i => i -> 100L)
    val e = intercept[Exception](count(inStar, maxDeg = 10))
    assert(e.getMessage != null && e.getMessage.contains("wedge degree"),
      s"got: ${e.getMessage}")
  }
}
