package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Clustering

class ZOrderExpressionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("interleave matches known Morton codes") {
    import spark.implicits._
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (3L, 5L, 39L), (1023L, 0L, 349525L), (0L, 1023L, 699050L), (1023L, 1023L, 1048575L))
    val df = cases.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .withColumn("z", ZOrderExpression.zorder2($"x", $"y", 10))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === cases)
  }

  test("scala eval agrees with codegen and masks out-of-domain inputs") {
    import spark.implicits._
    // negative and >2^bits inputs are masked into the domain, never throw
    val df = Seq((-1L, 5000L)).toDF("x", "y")
      .withColumn("z", ZOrderExpression.zorder2($"x", $"y", 10))
    val z = df.head().getLong(2)
    val expected = {
      val x = -1L & 1023; val y = 5000L & 1023
      (0 until 10).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    }
    assert(z === expected)
  }

  test("zorderBy yields disjoint per-partition z ranges (range clustering)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(4000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val clustered = Clustering.zorderBy(df, $"x", $"y", bits = 10, numPartitions = 8)
    val bounds = clustered.select(spark_partition_id().as("p"), $"z")
      .groupBy($"p").agg(min($"z").as("lo"), max($"z").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(bounds.map(_._4).sum === 4000)
    assert(bounds.length > 1, "expected multiple range partitions")
    // ranges are disjoint and ordered: each partition's lo > previous hi
    bounds.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 > a._3, s"overlapping z ranges: $a vs $b")
    }
    // clustering tightens per-partition x/y extents vs the global 1024 span.
    // A z-range that straddles a top-level quadrant split legitimately spans
    // a full dimension, so assert the TYPICAL partition is tight on both
    // axes rather than every partition.
    val extents = clustered.select(spark_partition_id().as("p"), $"x", $"y")
      .groupBy($"p").agg((max($"x") - min($"x")).as("xw"), (max($"y") - min($"y")).as("yw"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val tight = extents.count { case (xw, yw) => xw <= 660 && yw <= 660 }
    assert(tight >= extents.length - 2,
      s"z-order should bound both dimensions for most partitions, got ${extents.mkString(",")}")
  }
}
