package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Property laws for the round-13 additions (bottom-k quantile sketch,
  * star-contraction CC). Same conventions as Round12PropertySpec: raw
  * ScalaCheck generators with fixed seeds (scalatestplus isn't on the
  * offline classpath), laws exercised through real Spark plans. */
class Round13PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 12): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(0xC13L + i)))

  // ---- bottom-k quantile sketch ----

  /** (id, value) multisets with duplicates, negatives, and extremes. */
  private val datasetGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(0, 400)
    vs <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.choose(-1000L, 1000L),
      2 -> Gen.oneOf(0L, -1L, 1L, Long.MaxValue / 2, -Long.MaxValue / 2),
      3 -> Gen.choose(0L, 10L))) // heavy duplicate mass
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  private def sketchSet(df: org.apache.spark.sql.DataFrame, k: Int): Set[(Long, Long)] =
    QuantileSketch.build(df, "id", "v", k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("merge law: any shard partition of the data merges into the whole-corpus sketch") {
    for ((data, nShards) <- samples(datasetGen).zipWithIndex.map(d => (d._1, d._2 % 5 + 1))) {
      val df = data.toDF("id", "v")
      val whole = sketchSet(df, 64)
      val sharded = df.withColumn("shard", pmod(col("id"), lit(nShards.toLong)))
      val merged = QuantileSketch.merge(
        QuantileSketch.buildPerShard(sharded, "shard", "id", "v", 64), 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(merged == whole, s"shards=$nShards n=${data.size}")
    }
  }

  test("partitioning invariance: the aggregate form equals the TakeOrdered form") {
    for ((data, parts) <- samples(datasetGen).zipWithIndex.map(d => (d._1, d._2 % 7 + 1))) {
      val df = data.toDF("id", "v").repartition(parts)
      val viaAgg = QuantileSketch.buildAgg(df, "id", "v", 64)
        .select(explode(col("sk")).as("p"))
        .select(col("p.key"), col("p.value"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaAgg == sketchSet(df, 64), s"parts=$parts n=${data.size}")
    }
  }

  test("estimates are monotone in q and live in the sample's value range") {
    for (data <- samples(datasetGen).filter(_.nonEmpty)) {
      val df = data.toDF("id", "v")
      val est = QuantileSketch.estimates(
        QuantileSketch.build(df, "id", "v", 64), Seq(100, 2500, 5000, 7500, 9900))
        .orderBy("q_x1e4").collect().map(_.getLong(1))
      assert(est.sameElements(est.sorted), s"non-monotone: ${est.mkString(",")}")
      val vs = data.map(_._2)
      assert(est.head >= vs.min && est.last <= vs.max)
    }
  }

  // ---- star-contraction CC vs min-label CC on random shallow graphs ----

  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    nNodes <- Gen.choose(2, 60)
    nEdges <- Gen.choose(1, 90)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes - 1L)
      b <- Gen.choose(0L, nNodes - 1L)
    } yield (a, b))
  } yield edges.filter(e => e._1 != e._2)

  test("star CC equals min-label CC on random graphs (labels AND membership)") {
    for (edges <- samples(graphGen).filter(_.nonEmpty)) {
      val pairs = edges.toDF("id_a", "id_b")
      val star = CcStar.connectedComponentsStar(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val minl = Dedup.connectedComponents(pairs, maxIter = 100)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == minl, s"edges=${edges.take(8)}...")
    }
  }
}
