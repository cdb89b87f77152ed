package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FunnelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def run(events: Seq[(Long, Long, String)]): Map[Long, (Option[Long], Option[Long], Option[Long])] = {
    import spark.implicits._
    val df = events.toDF("user_id", "ts", "event_type")
    Funnel.userFunnel(df, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> ((opt(1), opt(2), opt(3)))
      }.toMap
  }

  test("strict ordering: a step only counts after the previous step") {
    val out = run(Seq(
      // user 1 completes in order
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // user 2: b BEFORE a — never reaches step 2
      (2L, 10L, "b"), (2L, 20L, "a"),
      // user 3: b at the SAME ts as a — strictly-after excludes it
      (3L, 10L, "a"), (3L, 10L, "b"), (3L, 20L, "b"), (3L, 30L, "c"),
      // user 4: never does a
      (4L, 5L, "b"), (4L, 6L, "c")))
    assert(out(1L) === ((Some(10L), Some(20L), Some(30L))))
    assert(out(2L) === ((Some(20L), None, None)))
    assert(out(3L) === ((Some(10L), Some(20L), Some(30L))))
    assert(out(4L) === ((None, None, None)))
  }

  test("earliest qualifying event wins at every step") {
    val out = run(Seq(
      (1L, 50L, "a"), (1L, 10L, "a"), // earliest a = 10
      (1L, 5L, "b"), (1L, 40L, "b"), (1L, 20L, "b"), // earliest b after 10 = 20
      (1L, 15L, "c"), (1L, 60L, "c"))) // earliest c after 20 = 60
    assert(out(1L) === ((Some(10L), Some(20L), Some(60L))))
  }

  test("unordered input arrival does not change the result") {
    val base = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (1L, 12L, "x"), (1L, 25L, "a"))
    assert(run(base) === run(base.reverse))
  }

  test("report aggregates counts and latencies") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 10L, "a"), (2L, 15L, "b"),
      (3L, 10L, "x")).toDF("user_id", "ts", "event_type")
    val r = Funnel.report(df, "user_id", "ts", "event_type", Seq("a", "b", "c")).head()
    // n_users, n_step1, n_step2, n_step3, lat12_sum, lat13_sum, converted_user_sum
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) === 2L)
    assert(r.getLong(3) === 1L)
    assert(r.getLong(4) === (20L - 10L) + (15L - 10L))
    assert(r.getLong(5) === 30L - 10L)
    assert(r.getLong(6) === 1L)
  }

  test("duplicate step names are rejected") {
    import spark.implicits._
    val df = Seq((1L, 1L, "a")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      Funnel.userFunnel(df, "user_id", "ts", "event_type", Seq("a", "a"))
    }
  }

  test("transitionCounts: adjacent pairs per user, integer shares, tie-break order") {
    import spark.implicits._
    val df = Seq(
      // user 1: a -> b -> a -> c   (pairs ab, ba, ac)
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"), (1L, 40L, 4L, "c"),
      // user 2: a -> b             (pair ab)
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b"),
      // user 3: equal timestamps — event_id tie-break fixes b -> a
      (3L, 10L, 8L, "a"), (3L, 10L, 7L, "b"),
      // user 4: single event, no pairs
      (4L, 10L, 9L, "z"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.transitionCounts(df, "user_id", "ts", "event_type", Seq("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      ("a", "b") -> ((2L, 6666L)), // from 'a': ab twice, ac once -> 2*10000 div 3
      ("a", "c") -> ((1L, 3333L)),
      ("b", "a") -> ((2L, 10000L)))) // user1 ba + user3 tie-broken ba
  }
}
