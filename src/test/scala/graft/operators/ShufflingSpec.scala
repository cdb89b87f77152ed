package graft.operators

import org.apache.spark.sql.functions.{col, spark_partition_id}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ShufflingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def docs(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"doc $i")).toDF("doc_id", "text")
  }

  test("epoch shuffle is a deterministic permutation; new seed, new order") {
    val df = docs(500)
    def order(seed: Long): Seq[Long] =
      Shuffling.epochShuffle(df, "doc_id", seed, 8)
        .select(spark_partition_id().as("p"), col("epoch_key"), col("doc_id"))
        .collect().sortBy(r => (r.getInt(0), r.getLong(1), r.getLong(2))).map(_.getLong(2)).toSeq
    val e0 = order(0L)
    assert(e0.toSet === (0L until 500L).toSet, "a permutation loses nothing")
    assert(e0 === order(0L), "same seed, same order")
    val e1 = order(1L)
    assert(e1.toSet === e0.toSet)
    assert(e1 !== e0, "different seed must permute differently")
    assert(e0 !== (0L until 500L).toSeq, "order must not be the identity")
  }

  test("partitions are range-disjoint and locally sorted (global order = concat)") {
    val parts = Shuffling.epochShuffle(docs(1000), "doc_id", 42L, 8)
      .select(spark_partition_id().as("p"), col("epoch_key"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).toSeq)
    // each partition locally sorted
    parts.foreach(ks => assert(ks === ks.sorted, "partition not locally sorted"))
    // ranges are disjoint and ascending across partition index
    parts.sliding(2).foreach {
      case Seq(a, b) if a.nonEmpty && b.nonEmpty => assert(a.last <= b.head, "ranges overlap")
      case _ =>
    }
  }

  test("epochKey matches the portable arithmetic spec") {
    import spark.implicits._
    val got = Seq(0L, 1L, 17L, 999999L).toDF("id")
      .select(col("id"), Shuffling.epochKey(col("id"), 7L).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mixed = (7L * 2654435761L) ^ (7L >>> 17)
    for ((id, k) <- got)
      assert(k === java.lang.Math.floorMod(id * 2654435761L + mixed, 4294967296L), s"id=$id")
  }
}
