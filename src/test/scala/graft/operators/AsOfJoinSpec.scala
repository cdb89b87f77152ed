package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def quotes = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 200.0)).toDF("key", "qts", "price")
  }

  private def trades = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:03:00"), "t1"), // after 10:00 quote -> 100.0
      (1L, ts("2024-01-01 10:05:00"), "t2"), // exactly at 10:05 -> 101.0 (inclusive)
      (1L, ts("2024-01-01 10:30:00"), "t3"), // after 10:10 -> 102.0
      (1L, ts("2024-01-01 09:59:00"), "t0"), // before any quote -> null
      (2L, ts("2024-01-01 10:08:00"), "t4"), // -> 200.0
      (3L, ts("2024-01-01 10:00:00"), "t5")) // no quotes for key 3 -> null
      .toDF("key", "tts", "trade")
  }

  test("backward as-of join: latest at-or-before quote per trade") {
    val out = AsOfJoin.joinAsOf(trades, quotes, "key", "tts", "qts", Seq("price"))
      .collect().map(r => r.getString(2) -> Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(
      "t1" -> Some(100.0), "t2" -> Some(101.0), "t3" -> Some(102.0),
      "t0" -> None, "t4" -> Some(200.0), "t5" -> None))
  }

  test("tolerance nulls out matches older than the bound") {
    val out = AsOfJoin.joinAsOf(trades, quotes, "key", "tts", "qts", Seq("price"),
      toleranceMs = Some(5 * 60 * 1000L))
      .collect().map(r => r.getString(2) -> Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    // t3 is 20 minutes after the last quote -> out of tolerance
    assert(out("t3") === None)
    assert(out("t1") === Some(100.0) && out("t2") === Some(101.0))
  }

  test("left row count is preserved exactly (no explosion, no drops)") {
    val out = AsOfJoin.joinAsOf(trades, quotes, "key", "tts", "qts", Seq("price"))
    assert(out.count() === 6)
    assert(out.columns.toSeq === Seq("key", "tts", "trade", "__asof_ts", "price"))
  }

  test("plan: one keyed window, no join of left against right") {
    val plan = AsOfJoin.joinAsOf(trades, quotes, "key", "tts", "qts", Seq("price"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }
}
