package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SamplingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def ids(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("hashSample is deterministic, rate-accurate and nested") {
    val df = ids(20000)
    val p5 = Sampling.hashSample(df, "id", 500).collect().map(_.getLong(0)).toSet
    val p5again = Sampling.hashSample(df, "id", 500).collect().map(_.getLong(0)).toSet
    assert(p5 === p5again, "same sample every run")
    // 5% of 20000 = 1000 expected; multiplicative hash is equidistributed
    assert(math.abs(p5.size - 1000) < 150, s"rate off: ${p5.size}")
    // nesting: the 1% sample is a subset of the 5% sample
    val p1 = Sampling.hashSample(df, "id", 100).collect().map(_.getLong(0)).toSet
    assert(p1.subsetOf(p5))
    assert(Sampling.hashSample(df, "id", 10000).count() === 20000L)
    assert(Sampling.hashSample(df, "id", 0).count() === 0L)
  }

  test("membership matches the arithmetic spec exactly (portability contract)") {
    val got = Sampling.hashSample(ids(5000), "id", 250).collect().map(_.getLong(0)).toSet
    val cutoff = 250L * 4294967296L / 10000L
    val want = (0L until 5000L).filter(id => java.lang.Long.remainderUnsigned(id * 2654435761L, 4294967296L) < cutoff).toSet
    assert(got === want)
  }

  test("stratifiedHashSample: per-stratum rates, unlisted strata dropped") {
    import spark.implicits._
    val df = (0L until 30000L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val out = Sampling.stratifiedHashSample(df, "source", "id",
      Map("src0" -> 10000, "src1" -> 1000)) // src2 unlisted -> dropped
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("src0") === 10000L, "100% stratum keeps everything")
    assert(math.abs(out("src1") - 1000L) < 200, s"10% stratum: ${out("src1")}")
    assert(!out.contains("src2"), "unlisted stratum must not leak")
  }

  test("sampling is a narrow codegen'd filter: no shuffle in the plan") {
    import org.apache.spark.sql.functions._
    val src = spark.range(100).toDF("id")
      .withColumn("s", concat(lit("src"), (col("id") % 2).cast("string")))
    val plan = Sampling.stratifiedHashSample(src, "s", "id", Map("src0" -> 500))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "stratified sampling must not shuffle")
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(plan.linesIterator.exists(l => l.contains("Filter") && l.contains("*(")),
      s"filter must stay in codegen:\n$plan")
  }

  test("temperature mixing boosts small sources and caps rates at 1") {
    // skewed counts 800 / 150 / 50; T=2 flattens toward equal shares
    val counts = Map("big" -> 800L, "mid" -> 150L, "small" -> 50L)
    val cut = Sampling.temperatureMixCutoffs(counts, temperature = 2.0, targetFraction = 0.5)
    val ring = 4294967296.0
    val rate = cut.view.mapValues(_ / ring).toMap
    // temperature ordering: the smaller the source, the higher its rate
    assert(rate("small") > rate("mid") && rate("mid") > rate("big"), rate.toString)
    // all rates in [0, 1]; grid-aligned to 2^20
    assert(cut.values.forall(c => c >= 0L && c <= 4294967296L && c % (1L << 20) == 0L))
    // T=1 with full target keeps everything
    val all = Sampling.temperatureMixCutoffs(counts, 1.0, 1.0)
    assert(all.values.forall(_ == 4294967296L))
  }

  test("temperatureMixSample filters by the derived cutoffs without a shuffle") {
    import spark.implicits._
    val df = (0L until 700L).map(i => (i, if (i % 7 < 4) "big" else if (i % 7 < 6) "mid" else "small"))
      .toDF("id", "s")
    val out = Sampling.temperatureMixSample(df, "s", "id", temperature = 2.0, targetFraction = 0.5)
    val got = out.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // membership must equal the hash predicate applied manually
    val cutoffs = Sampling.temperatureMixCutoffs(
      Map("big" -> 400L, "mid" -> 200L, "small" -> 100L), 2.0, 0.5)
    val expect = (0L until 700L).groupBy(i => if (i % 7 < 4) "big" else if (i % 7 < 6) "mid" else "small")
      .map { case (s, is) => s -> is.count(i => java.lang.Long.remainderUnsigned(i * 2654435761L, 4294967296L) < cutoffs(s)).toLong }
    assert(got === expect.filter(_._2 > 0L))
  }

  test("temperatureMixSample accepts non-string strata columns (advisor r7)") {
    import spark.implicits._
    // integer strata: previously getString(0) threw ClassCastException
    val df = (0L until 700L).map(i => (i, (i % 3).toInt)).toDF("id", "s")
    val out = Sampling.temperatureMixSample(df, "s", "id", temperature = 2.0, targetFraction = 0.5)
    val got = out.groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.keySet.subsetOf(Set(0, 1, 2)))
    // same data with the stratum pre-cast to string must select the SAME rows
    val viaString = Sampling.temperatureMixSample(
      df.withColumn("s", col("s").cast("string")), "s", "id", 2.0, 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out.select("id").collect().map(_.getLong(0)).toSet === viaString)
  }

  test("fixedKPerStratum: exactly min(k, n) per stratum, hash-rank order, full rows") {
    import spark.implicits._
    val df = (0L until 90L).map(i => (i, "s" + (i % 4), s"body $i")).toDF("id", "s", "body")
    val out = Sampling.fixedKPerStratum(df, "s", "id", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // exactly 5 per stratum (all strata have >= 5 members)
    assert(out.groupBy(_._2).view.mapValues(_.length).toMap ===
      Map("s0" -> 5, "s1" -> 5, "s2" -> 5, "s3" -> 5))
    // payload columns survive the semi-join
    out.foreach { case (id, _, body) => assert(body === s"body $id") }
    // winners are precisely the k smallest portable hashes per stratum
    val knuth = 2654435761L
    def h(id: Long) = java.lang.Long.remainderUnsigned(id * knuth, 4294967296L)
    (0 until 4).foreach { s =>
      val members = (0L until 90L).filter(_ % 4 == s)
      val expect = members.sortBy(id => (h(id), id)).take(5).toSet
      assert(out.filter(_._2 == "s" + s).map(_._1).toSet === expect, s"stratum s$s")
    }
    // a stratum smaller than k returns whole
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "s")
    assert(Sampling.fixedKPerStratum(tiny, "s", "id", 5).count() === 3L)
  }

  test("mixturePlan computes weights, allotments, and epochs per group") {
    import spark.implicits._
    // en: 600 tokens observed, es: 400 -> shares 600000/400000 ppm
    val df = Seq(("en", 100L), ("en", 500L), ("es", 400L), (null, 999L)).toDF("lang", "toks")
    val out = Sampling.mixturePlan(df, "lang", "toks",
        Map("en" -> 250000L, "es" -> 750000L), budgetTokens = 1000000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // null group dropped entirely
    assert(out.keySet === Set("en", "es"))
    // en: weight = 0.25/0.6 x1e6 ~ 416667; planned = 250k; epochs = 250000/600*100
    assert(out("en") === ((600L, 600000L, 250000L, 416667L, 250000L, 41667L)))
    // es: up-sampled (weight > 1e6): 0.75/0.4 = 1.875
    assert(out("es") === ((400L, 400000L, 750000L, 1875000L, 750000L, 187500L)))
  }

  test("mixturePlan: groups absent from the target get weight 0") {
    import spark.implicits._
    val df = Seq(("en", 100L), ("xx", 900L)).toDF("lang", "toks")
    val out = Sampling.mixturePlan(df, "lang", "toks", Map("en" -> 1000000L), 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("xx") === ((0L, 0L, 0L)))
    assert(out("en")._2 === 10000000L) // 1.0 target / 0.1 observed = 10x
  }

  test("curriculumMix: one scan, per-epoch membership equals temperatureMixSample") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, "s" + (i % 3))).toDF("id", "s")
    val sched = Seq((1, 1.0, 0.4), (2, 2.0, 0.4), (3, 4.0, 0.4))
    val out = Sampling.curriculumMix(df, "s", "id", sched)
      .select("epoch", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    sched.foreach { case (ep, t, f) =>
      val expect = Sampling.temperatureMixSample(df, "s", "id", t, f)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(out.filter(_._1 == ep).map(_._2) === expect, s"epoch $ep")
    }
    intercept[IllegalArgumentException] {
      Sampling.curriculumMix(df, "s", "id", Seq((1, 1.0, 0.4), (1, 2.0, 0.4)))
    }
  }

  test("fixedKPerStratum: ids repeated across strata never leak losers through the re-attach") {
    import spark.implicits._
    // both strata use ids 0..9 (per-source sequence numbers)
    val df = (0L until 10L).flatMap(i => Seq(("a", i), ("b", i))).toDF("s", "id")
    val out = Sampling.fixedKPerStratum(df, "s", "id", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.length === 6, s"expected exactly 3 per stratum, got ${out.toSeq}")
    assert(out.groupBy(_._1).values.forall(_.length === 3))
  }

  test("mixturePlan survives a realistic LLM token budget without Long overflow") {
    import spark.implicits._
    val df = Seq(("web", 100L), ("code", 50L)).toDF("g", "toks")
    val out = Sampling.mixturePlan(df, "g", "toks",
      Map("web" -> 700000L, "code" -> 300000L), budgetTokens = 15_000_000_000_000L)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(out("web") === 10_500_000_000_000L) // 70% of 15T, was negative under Long math
    assert(out("code") === 4_500_000_000_000L)
  }

  test("weightedSampleK matches the A-ES arithmetic spec exactly") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => (if (i % 2 == 0) "a" else "b", i, 10.0 + i))
    val df = rows.toDF("g", "id", "w")
    val out = Sampling.weightedSampleK(df, "g", "id", "w", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // replay the draw: u from the Knuth ring hash, key floor-snapped to 2^20
    def key(id: Long, w: Double): Long = {
      val h = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
      math.floor(math.pow((h + 0.5) / 4294967296.0, 1.0 / w) * (1L << 20)).toLong
    }
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map { case (_, id, w) => (id, key(id, w)) }
        .sortBy { case (id, s) => (-s, id) }.take(3).zipWithIndex
        .map { case ((id, _), r) => (g, id, (r + 1).toLong) }
    }.toSet
    assert(out === expected)
  }

  test("weightedSampleK: non-positive weights never enter the draw; small groups keep all") {
    import spark.implicits._
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 0.0), ("a", 3L, -1.0), ("b", 9L, 2.0))
      .toDF("g", "id", "w")
    val out = Sampling.weightedSampleK(df, "g", "id", "w", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out === Set(("a", 1L), ("b", 9L)))
  }

  test("weightedSampleK plans the bounded-heap aggregate, never a window sort") {
    import spark.implicits._
    val df = (0L until 100L).map(i => ("g", i, 1.0 + i)).toDF("g", "id", "w")
    val plan = Sampling.weightedSampleK(df, "g", "id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_top_k_by_score"), s"heap aggregate missing:\n$plan")
    assert(!plan.contains("Window"), s"window-rank crept in:\n$plan")
  }

  test("weightedSampleK is partitioning-invariant") {
    import spark.implicits._
    val df = (0L until 100L).map(i => ("g", i, 1.0 + (i % 7))).toDF("g", "id", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSampleK(d, "g", "id", "w", k = 10)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(run(df.repartition(1)) === run(df.repartition(13, col("id"))))
  }
}
