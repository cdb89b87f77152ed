package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SemDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  // (id, cluster, vec): cluster 0 holds an identical pair (1,2) and an
  // orthogonal vector 3; cluster 1 holds an identical pair (4,5); vector 6
  // duplicates vector 1 but sits in ANOTHER cluster, so it must survive
  private def base = {
    import spark.implicits._
    Seq(
      (1L, 0L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, 0L, Seq(1.0f, 0.0f, 0.0f)),
      (3L, 0L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, 1L, Seq(0.0f, 0.0f, 1.0f)),
      (5L, 1L, Seq(0.0f, 0.0f, 1.0f)),
      (6L, 2L, Seq(1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "cluster", "emb")
  }

  test("prunes later near-duplicates within a cluster only") {
    val pairs = SemDedup.withinClusterPairs(base, "vec_id", "emb", "cluster", tau = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (4L, 5L)))

    val kept = SemDedup.prune(base, "vec_id", "emb", "cluster", tau = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L, 6L))
  }

  test("tau below cross-vector cosine keeps everything") {
    val kept = SemDedup.prune(base, "vec_id", "emb", "cluster", tau = 1.1)
      .count()
    assert(kept === 6L)
  }

  test("null id, null cluster, null/zero embedding are kept, never compared") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(0L), Some(Seq(1.0f, 0.0f))),
      (Some(2L), Some(0L), Some(Seq(1.0f, 0.0f))),   // dropped (dup of 1)
      (None, Some(0L), Some(Seq(1.0f, 0.0f))),        // null id -> kept
      (Some(7L), None, Some(Seq(1.0f, 0.0f))),        // null cluster -> kept
      (Some(8L), Some(0L), None),                     // null emb -> kept
      (Some(9L), Some(0L), Some(Seq(0.0f, 0.0f)))     // zero norm -> kept
    ).toDF("vec_id", "cluster", "emb")
    val kept = SemDedup.prune(df, "vec_id", "emb", "cluster", tau = 0.9)
    assert(kept.count() === 5L)
    assert(kept.where(col("vec_id") === 2L).count() === 0L)
  }

  test("oversized cluster raises loudly instead of scheduling quadratic work") {
    import spark.implicits._
    val big = spark.range(10).select(
      col("id").as("vec_id"), lit(0L).as("cluster"),
      array(lit(1.0f), lit(0.0f)).as("emb"))
    val ex = intercept[Exception] {
      SemDedup.withinClusterPairs(big, "vec_id", "emb", "cluster", tau = 0.9, maxCluster = 5).count()
    }
    assert(ex.getMessage.contains("semdedup cluster over"))
  }
}
