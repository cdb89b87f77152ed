package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CohortsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("retention triangle: cohorts by first period, offsets by activity") {
    import spark.implicits._
    // period length 10: user 1 cohort 0 active {0,1,3}; user 2 cohort 0
    // active {0}; user 3 cohort 1 active {1,3}; user 4 cohort 3 active {3}
    val events = Seq(
      (1L, 5L), (1L, 12L), (1L, 19L), (1L, 31L),
      (2L, 9L),
      (3L, 10L), (3L, 38L),
      (4L, 30L)).toDF("user_id", "ts")
    val out = Cohorts.retention(events, "user_id", "ts", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L,
      (3L, 0L) -> 1L))
  }

  test("offset-0 cell equals cohort size; multiple events in a period count once") {
    import spark.implicits._
    val events = Seq(
      (1L, 0L), (1L, 1L), (1L, 2L), // three events, one period
      (2L, 3L), (2L, 4L)).toDF("user_id", "ts")
    val out = Cohorts.retention(events, "user_id", "ts", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((0L, 0L) -> 2L))
  }

  test("pre-epoch events land in the FLOOR period (matches the oracle's //)") {
    import spark.implicits._
    // ts -1 with period 10: floor -> period -1 (truncating div would say 0)
    val df = Seq((1L, -1L), (1L, 11L)).toDF("u", "ts")
    val out = Cohorts.retention(df, "u", "ts", periodLength = 10L)
      .orderBy("offset").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((-1L, 0L), (-1L, 2L))) // cohort -1, offsets 0 and 2
  }

  test("periodLength must be positive") {
    import spark.implicits._
    val events = Seq((1L, 0L)).toDF("user_id", "ts")
    intercept[IllegalArgumentException] {
      Cohorts.retention(events, "user_id", "ts", 0L)
    }
  }
}
