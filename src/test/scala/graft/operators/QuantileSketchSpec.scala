package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the bottom-k hash-priority quantile sketch:
  * rank-error bound (the DKW-style guarantee the operator's scaladoc
  * states), exact shard merge, exactness below k, and the per-group
  * backend agreeing with the global one. */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  /** n rows with value = id (so true rank of value v is exactly v). */
  private def linear(n: Int): DataFrame =
    spark.range(1, n + 1).select(col("id"), col("id").as("v"))

  test("rank error stays within the DKW bound at k=1024 over n=50000") {
    val n = 50000
    val k = 1024
    val qs = Seq(1000, 2500, 5000, 7500, 9000, 9900)
    val est = QuantileSketch.estimates(
      QuantileSketch.build(linear(n), "id", "v", k), qs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // DKW: sup-rank error <= sqrt(ln(2/delta) / (2k)); delta = 1e-6 gives
    // ~0.084 at k=1024. The data+hash are fixed, so this is deterministic
    // — observed error is typically ~1-3%; the assert uses the bound.
    val eps = math.sqrt(math.log(2.0 / 1e-6) / (2.0 * k))
    qs.foreach { q =>
      val trueRank = q.toDouble / 10000 * n
      val estRank = est(q.toLong).toDouble // value == rank in this data
      assert(math.abs(estRank - trueRank) <= eps * n,
        s"q=$q: est rank $estRank vs true $trueRank exceeds eps*n = ${eps * n}")
    }
  }

  test("shard sketches merge EXACTLY into the single-pass sketch") {
    val df = linear(20000).withColumn("shard", expr("id % 7"))
    val whole = QuantileSketch.build(df, "id", "v", 512)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val merged = QuantileSketch.merge(
      QuantileSketch.buildPerShard(df, "shard", "id", "v", 512), 512)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(merged.length == 512)
    assert(merged.sameElements(whole))
  }

  test("n <= k makes every quantile exact") {
    val est = QuantileSketch.estimates(
      QuantileSketch.build(linear(100), "id", "v", 1024), Seq(2500, 5000, 7500))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ceil-rank quantiles of 1..100 are exactly q*100/10000
    assert(est(2500L) == 25L && est(5000L) == 50L && est(7500L) == 75L)
  }

  test("duplicate-heavy input is sampled per occurrence, not per value") {
    // 9000 copies of value 1 and 1000 of value 2: p50 must be 1. A
    // value-hash sample would keep both values once each and report the
    // median anywhere; the per-occurrence priority keeps the mass.
    val df = spark.range(1, 10001)
      .select(col("id"), when(col("id") <= 9000, lit(1L)).otherwise(lit(2L)).as("v"))
    val est = QuantileSketch.estimates(
      QuantileSketch.build(df, "id", "v", 256), Seq(5000, 9900))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(5000L) == 1L)
    assert(est(9900L) == 2L)
  }

  test("groupEstimates matches global estimates on a single group") {
    val df = linear(5000).withColumn("g", lit("only"))
    val viaGroup = QuantileSketch.groupEstimates(
      df, "g", "id", "v", Seq(2500, 5000, 7500), k = 512)
      .collect()
    assert(viaGroup.length == 1)
    val vs = viaGroup.head.getSeq[Double](2).map(_.toLong)
    val global = QuantileSketch.estimates(
      QuantileSketch.build(df, "id", "v", 512), Seq(2500, 5000, 7500))
      .orderBy("q_x1e4").collect().map(_.getLong(1)).toSeq
    assert(viaGroup.head.getLong(1) == 5000L)
    assert(vs == global)
  }

  test("contract edges: bad k and bad quantile grid are rejected loudly") {
    val df = linear(10)
    intercept[IllegalArgumentException](QuantileSketch.build(df, "id", "v", 8))
    intercept[IllegalArgumentException](QuantileSketch.build(df, "id", "v", 100000))
    intercept[IllegalArgumentException](
      QuantileSketch.estimates(QuantileSketch.build(df, "id", "v", 16), Seq(0)))
    intercept[IllegalArgumentException](
      QuantileSketch.estimates(QuantileSketch.build(df, "id", "v", 16), Seq(10000)))
  }
}
