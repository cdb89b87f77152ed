package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ResampleSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val G = 1000000000L // ns per second

  test("missing buckets are materialized and forward-filled") {
    import spark.implicits._
    // key 1: events in buckets 0, 3 (10s buckets) -> spine 0,1,2,3
    val df = Seq(
      (1L, 5L * G, 1.0),
      (1L, 35L * G, 4.0),
      (2L, 12L * G, 9.0)).toDF("k", "ts", "v")
    val out = Resample.gapFillForward(df, "k", "ts", "v", bucketSeconds = 10L)
      .orderBy("key", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, Some(1.0), 1.0),
      (1L, 1L, None, 1.0),
      (1L, 2L, None, 1.0),
      (1L, 3L, Some(4.0), 4.0),
      (2L, 1L, Some(9.0), 9.0)))
  }

  test("duplicate events in one bucket take the max (order-independent)") {
    import spark.implicits._
    val df = Seq((1L, 1L * G, 2.0), (1L, 2L * G, 7.0), (1L, 3L * G, 5.0))
      .toDF("k", "ts", "v")
    val out = Resample.gapFillForward(df, "k", "ts", "v", bucketSeconds = 10L).collect()
    assert(out.length === 1)
    assert(out(0).getDouble(3) === 7.0)
  }

  test("an oversized grid fails loudly instead of exploding") {
    import spark.implicits._
    val df = Seq((1L, 0L, 1.0), (1L, 100L * G, 2.0)).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      Resample.gapFillForward(df, "k", "ts", "v", bucketSeconds = 1L, maxBuckets = 50L).collect()
    }
    assert(e.getMessage != null)
  }

  test("pre-epoch timestamps bucket by floor, not truncation") {
    import spark.implicits._
    // -1ns is in bucket -1 (floor), not bucket 0 (truncate)
    val df = Seq((1L, -1L, 5.0), (1L, 1L, 7.0)).toDF("k", "ts", "v")
    val out = Resample.gapFillForward(df, "k", "ts", "v", bucketSeconds = 10L)
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(out.toSeq === Seq((-1L, 5.0), (0L, 7.0)))
  }

  test("cent checksum is integer-stable") {
    import spark.implicits._
    val df = Seq((1L, 6.55), (2L, 12.31)).toDF("k", "v")
    val s = df.select(sum(Resample.centChecksum(col("v"))).cast("long")).collect()(0).getLong(0)
    assert(s === 655L + 1231L)
  }
}
