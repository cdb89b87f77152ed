package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The round-9 regression class: an operator whose tsCol contract silently
  * diverges from the data's dtype. Every tsCol-taking operator must accept
  * BOTH an integral epoch column and a timestamp column, and produce
  * identical results for the same instants. */
class TimeColsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def tsOf(epochSec: Long) = new Timestamp(epochSec * 1000L)

  test("epochMicros: timestamp converts exactly, long passes through") {
    import spark.implicits._
    val df = Seq((7L, tsOf(120))).toDF("us", "t")
    val out = df.select(
      TimeCols.epochMicros(df, "us").as("a"),
      TimeCols.epochMicros(df, "t").as("b")).head()
    assert(out.getLong(0) === 7L)
    assert(out.getLong(1) === 120000000L)
  }

  test("epochMicros rejects non-time dtypes loudly") {
    import spark.implicits._
    val df = Seq(("x", 1L)).toDF("s", "l")
    val e = intercept[IllegalArgumentException] { TimeCols.epochMicros(df, "s") }
    assert(e.getMessage.contains("must be integral or timestamp"))
  }

  test("floorBucketOf floors (not truncates) negative epochs") {
    import spark.implicits._
    val df = Seq(-1L, 0L, 9L, 10L, -10L, -11L).toDF("e")
    val out = df.select(col("e"), TimeCols.floorBucketOf("e", 10L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(-1L -> -1L, 0L -> 0L, 9L -> 0L, 10L -> 1L, -10L -> -1L, -11L -> -2L))
  }

  test("Resample accepts timestamp and long-nanos inputs identically") {
    import spark.implicits._
    // same instants: 5s, 35s, 12s — 10s buckets
    val longs = Seq((1L, 5L * 1000000000L, 1.0), (1L, 35L * 1000000000L, 4.0),
      (2L, 12L * 1000000000L, 9.0)).toDF("k", "ts", "v")
    val stamps = Seq((1L, tsOf(5), 1.0), (1L, tsOf(35), 4.0), (2L, tsOf(12), 9.0))
      .toDF("k", "ts", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Resample.gapFillForward(df, "k", "ts", "v", bucketSeconds = 10L)
        .orderBy("key", "bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getDouble(3))).toSeq
    assert(run(longs) === run(stamps))
    assert(run(stamps).map(t => (t._1, t._2)) ===
      Seq((1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)))
  }

  test("Funnel accepts timestamp and micros inputs identically") {
    import spark.implicits._
    val micros = Seq((1L, 10L * 1000000L, "view"), (1L, 20L * 1000000L, "buy"))
      .toDF("u", "ts", "tp")
    val stamps = Seq((1L, tsOf(10), "view"), (1L, tsOf(20), "buy")).toDF("u", "ts", "tp")
    def run(df: org.apache.spark.sql.DataFrame) =
      Funnel.userFunnel(df, "u", "ts", "tp", Seq("view", "buy"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(micros) === run(stamps))
    assert(run(stamps) === Seq((1L, 10000000L, 20000000L)))
  }

  test("Cohorts accepts timestamp and micros inputs identically") {
    import spark.implicits._
    val micros = Seq((1L, 5L * 1000000L), (1L, 25L * 1000000L), (2L, 15L * 1000000L))
      .toDF("u", "ts")
    val stamps = Seq((1L, tsOf(5)), (1L, tsOf(25)), (2L, tsOf(15))).toDF("u", "ts")
    def run(df: org.apache.spark.sql.DataFrame) =
      Cohorts.retention(df, "u", "ts", periodLength = 10L * 1000000L)
        .orderBy("cohort", "offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(micros) === run(stamps))
    assert(run(stamps) === Seq((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }
}
