package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("bucketed+sorted tables join with zero shuffle and match the plain join") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "payload")
    val dim = (0 to 99).map(i => (i.toLong, s"d$i")).toDF("k", "attr")

    Bucketing.writeBucketed(fact, "graft_bkt_fact", "k", buckets = 8)
    Bucketing.writeBucketed(dim, "graft_bkt_dim", "k", buckets = 8)
    try {
      val joined = Bucketing.bucketedJoin(spark, "graft_bkt_fact", "graft_bkt_dim", "k")
      // the property bucketing buys: no exchange on either side
      assert(Bucketing.isShuffleFree(joined),
        s"expected shuffle-free plan, got:\n${joined.queryExecution.executedPlan}")
      val got = joined.select("k", "payload", "attr")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      val expected = fact.join(dim, "k").select("k", "payload", "attr")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      assert(got.toSeq === expected.toSeq)

      // contrast: the same join WITHOUT bucketing shuffles both sides
      // (merge hint: tiny test frames would otherwise broadcast)
      assert(!Bucketing.isShuffleFree(fact.hint("merge").join(dim.hint("merge"), "k")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_fact")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dim")
    }
  }
}
