package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ImportanceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("target-heavy docs outrank raw-only docs") {
    import spark.implicits._
    // 'aa' and 'bb' dominate the target; 'zzzz' appears only off-target.
    // bucket('aa') != bucket('zzzz') for nBuckets=64 (lengths 2 vs 4).
    val docs = Seq(
      (1L, "aa bb aa bb", "en"),
      (2L, "aa bb", "en"),
      (3L, "zzzz zzzz zzzz", "de"),
      (4L, "aa zzzz", "de")
    ).toDF("doc_id", "text", "lang")
    val out = Importance.selectTopK(docs, "doc_id", "text", col("lang") === "en", 64, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ratios: bucket(aa) 4 occurrences / 3 in target -> 750000;
    // bucket(bb) 3/3 -> 1000000; bucket(zzzz) 4/0 -> 0
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(byId(1L) === 2L * 750000L + 2L * 1000000L)
    assert(byId(2L) === 750000L + 1000000L)
    assert(byId(3L) === 0L)
    assert(byId(4L) === 750000L)
    // rank order: score desc, id asc
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 4L, 3L))
  }

  test("k bounds the selection; ties at the boundary break by id") {
    import spark.implicits._
    val docs = (1L to 5L).map(i => (i, "same same", "en")).toDF("doc_id", "text", "lang")
    val out = Importance.selectTopK(docs, "doc_id", "text", col("lang") === "en", 64, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(1L, 2L, 3L))
  }

  test("null and empty text yield no score row; bucket is engine-portable") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ok token", "en"),
      (2L, null.asInstanceOf[String], "en"),
      (3L, "   ", "en")
    ).toDF("doc_id", "text", "lang")
    val out = Importance.selectTopK(docs, "doc_id", "text", col("lang") === "en", 64, 10)
      .collect()
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    // bucketOf('ok') = (2*31 + 111) % 64 = 173 % 64 = 45
    val b = docs.limit(1).select(Importance.bucketOf(lit("ok"), 64)).collect()(0).getInt(0)
    assert(b === 45)
  }
}
