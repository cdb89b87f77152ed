package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SplitsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("cluster members always share a split; unclustered docs key by self") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // two clusters: {1,2,3} (a chain) and {50,51}
    val pairs = Seq((1L, 2L), (2L, 3L), (50L, 51L)).toDF("id_a", "id_b")
    val out = Splits.clusterStableSplit(docs, "doc_id", pairs,
      Seq(("train", 9000), ("val", 500), ("test", 500)))
      .select(col("doc_id"), col("split_key"), col("split"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size === 200)
    // cluster keys are the component representative (min id)
    assert(Seq(1L, 2L, 3L).map(out(_)._1).toSet === Set(1L))
    assert(Seq(50L, 51L).map(out(_)._1).toSet === Set(50L))
    // and therefore the same split
    assert(Seq(1L, 2L, 3L).map(out(_)._2).toSet.size === 1)
    assert(Seq(50L, 51L).map(out(_)._2).toSet.size === 1)
    // everyone else keys by itself
    assert(out(7L)._1 === 7L)
    // assignment matches the portable integer-hash spec exactly
    val cut9000 = Sampling.cutoff(9000)
    val cut9500 = Sampling.cutoff(9500)
    out.foreach { case (_, (key, split)) =>
      val h = java.lang.Long.remainderUnsigned(key * 2654435761L, 4294967296L)
      val expect = if (h < cut9000) "train" else if (h < cut9500) "val" else "test"
      assert(split === expect, s"key=$key")
    }
  }

  test("split proportions approximate the basis points over many keys") {
    import spark.implicits._
    val docs = (0L until 5000L).map(i => (i, "x")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Splits.clusterStableSplit(docs, "doc_id", empty,
      Seq(("train", 8000), ("val", 1000), ("test", 1000)))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("train") > 3800 && got("train") < 4200, got.toString)
    assert(got.getOrElse("val", 0L) + got.getOrElse("test", 0L) === 5000 - got("train"))
  }

  test("invalid split specs are rejected") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    intercept[IllegalArgumentException](
      Splits.clusterStableSplit(docs, "doc_id", pairs, Seq(("a", 5000), ("b", 4000))))
    intercept[IllegalArgumentException](
      Splits.clusterStableSplit(docs, "doc_id", pairs, Seq(("a", 5000), ("a", 5000))))
  }
}
