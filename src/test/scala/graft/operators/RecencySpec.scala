package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RecencySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val Ref = 1706745600L // 2024-02-01T00:00:00Z

  private def ts(daysBefore: Long, plusSec: Long = 0L): Timestamp =
    new Timestamp((Ref - daysBefore * 86400 + plusSec) * 1000L)

  private def run(rows: Seq[(Long, Timestamp, Double)], halfLife: Int = 7) = {
    import spark.implicits._
    Recency.halfLifeWeightedSum(rows.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", Ref, halfLife)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("weights halve per half-life bucket; values on the cents grid") {
    // ages 0, 7, 14 days -> buckets 0,1,2 -> weights 2^30, 2^29, 2^28
    val rows = Seq(
      (1L, ts(0, plusSec = -10), 1.00),
      (1L, ts(7, plusSec = -10), 2.00),
      (2L, ts(14, plusSec = -10), -0.50))
    val got = run(rows)
    val w0 = 1L << 30; val w1 = 1L << 29; val w2 = 1L << 28
    assert(got(1L) === ((2L, w0 + w1, 100L * w0 + 200L * w1)))
    assert(got(2L) === ((1L, w2, -50L * w2)))
  }

  test("events older than maxShift buckets decay to exactly zero") {
    // bucket 31 with halfLife 1 day -> weight 0, still counted
    val got = run(Seq((9L, ts(31, plusSec = -1), 5.0)), halfLife = 1)
    assert(got(9L) === ((1L, 0L, 0L)))
  }

  test("an event after the reference instant fails loudly") {
    // both a full day after AND 30 s after: the guard is on raw seconds,
    // so a sub-day-future event must not slip through `div 86400`'s
    // truncation toward zero with full weight (advisor r11)
    for (future <- Seq(ts(-1), ts(0, plusSec = 30))) {
      val ex = intercept[Exception] {
        run(Seq((1L, future, 1.0)))
      }
      assert(ex.getMessage.contains("refEpochSec") ||
        Option(ex.getCause).exists(_.getMessage.contains("refEpochSec")))
    }
  }

  test("deterministic across partitionings (pure integer reduction)") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i % 11, ts(i % 28, plusSec = -(i + 1)), (i % 17).toDouble / 4))
    def go(parts: Int) = Recency.halfLifeWeightedSum(
      rows.toDF("user_id", "ts", "value").repartition(parts),
      "user_id", "ts", "value", Ref, halfLifeDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(go(1) === go(13))
  }
}
