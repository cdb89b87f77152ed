package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PrivacySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("anonymityReport computes class size, l-diversity, and pass flags") {
    import spark.implicits._
    // class (1,a): 3 rows, 3 distinct sensitive; class (1,b): 2 rows, 1 distinct
    val df = Seq(
      (1, "a", 100), (1, "a", 200), (1, "a", 300),
      (1, "b", 500), (1, "b", 500)).toDF("q1", "q2", "s")
    val out = Privacy.anonymityReport(df, Seq("q1", "q2"), "s", k = 3, l = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2))
    assert(out.toSeq === Seq(
      (1, "a", 3L, 3L, 1L, 1L),   // k=3 ok, l=3 >= 2 ok
      (1, "b", 2L, 1L, 0L, 0L)))  // size 2 < 3, l-div 1 < 2
  }

  test("bucketFloor floors toward -infinity for negative values (pmod)") {
    import spark.implicits._
    val df = Seq(-150L, -100L, -1L, 0L, 99L, 100L).toDF("v")
    val out = df.select(Privacy.bucketFloor(org.apache.spark.sql.functions.col("v"), 100L))
      .collect().map(_.getLong(0))
    // plain v/width*width would send -1 to 0, merging the buckets around 0
    assert(out.toSeq === Seq(-200L, -100L, -100L, 0L, 0L, 100L))
  }

  test("generalizationLadder marks the minimal width reaching k") {
    import spark.implicits._
    // 12 rows, one categorical class; values 0..11 -> width 1: every class
    // size 1 (fails k=3); width 4: classes {0..3},{4..7},{8..11} of size 4
    // (passes); width 100: one class of 12 (also passes, but NOT minimal)
    val df = (0L until 12L).map(v => ("x", v)).toDF("cat", "v")
    val out = Privacy.generalizationLadder(df, "v", Seq(1L, 4L, 100L), Seq("cat"), k = 3)
      .orderBy("width")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 12L, 1L, 12L, 0L),
      (4L, 3L, 4L, 0L, 1L),
      (100L, 1L, 12L, 0L, 0L)))
  }

  test("generalizationLadder: no level satisfying k -> no row chosen") {
    import spark.implicits._
    val df = Seq(("x", 1L), ("y", 2L)).toDF("cat", "v") // classes of 1 forever
    val out = Privacy.generalizationLadder(df, "v", Seq(10L, 100L), Seq("cat"), k = 5)
      .collect().map(r => r.getLong(4))
    assert(out.forall(_ === 0L))
  }
}
