package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CompactionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("buckets are contiguous in hash order and respect the bin-pack bound") {
    import spark.implicits._
    val rows = (0L until 100L).map(i => ("k" + (i % 3), i, 10L + (i % 7)))
    val df = rows.toDF("key", "id", "sz")
    val out = Compaction.planBuckets(df, "key", "id", "sz", targetSize = 40L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(out.length === 100)
    // recompute the reference assignment: walk each key in (hash, id) order
    val knuth = 2654435761L
    def h(id: Long) = java.lang.Long.remainderUnsigned(id * knuth, 4294967296L)
    val byKey = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.sortBy(r => (h(r._2), r._2))
    }
    val expect = byKey.flatMap { case (k, rs) =>
      var cum = 0L
      rs.map { case (_, id, sz) =>
        val b = cum / 40L
        cum += sz
        (k, id) -> b
      }
    }.toMap
    out.foreach { case (k, id, b, _) =>
      assert(b === expect((k, id)), s"key=$k id=$id")
    }
    // bin-pack bound: a non-final bucket spans start offsets [bT, (b+1)T)
    // and its first row starts within maxRow of bT, so its total exceeds
    // targetSize - maxRowSize (here rows are 10..16 -> bound 40-16=24)
    val sizes = out.groupBy(t => (t._1, t._3)).map { case (kb, ts) => kb -> ts.map(_._4).sum }
    sizes.foreach { case ((k, b), total) =>
      val isLast = !sizes.contains((k, b + 1))
      if (!isLast) assert(total > 40L - 16L, s"non-final bucket ($k,$b) underfilled: $total")
    }
  }

  test("a row larger than targetSize gets a bucket boundary, not an error") {
    import spark.implicits._
    val df = Seq(("k", 1L, 500L), ("k", 2L, 5L), ("k", 3L, 5L)).toDF("key", "id", "sz")
    val out = Compaction.planBuckets(df, "key", "id", "sz", targetSize = 10L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // all assignments defined, deterministic, non-negative
    assert(out.size === 3)
    assert(out.values.forall(_ >= 0L))
  }

  test("planSummary row/size totals reconcile with the input") {
    import spark.implicits._
    val df = (0L until 50L).map(i => ("s" + (i % 2), i, 100L)).toDF("key", "id", "sz")
    val sum = Compaction.planSummary(df, "key", "id", "sz", targetSize = 300L)
    val agg = sum.agg(
      org.apache.spark.sql.functions.sum(col("n_rows")),
      org.apache.spark.sql.functions.sum(col("bucket_size"))).head()
    assert(agg.getLong(0) === 50L)
    assert(agg.getLong(1) === 5000L)
    // target 300 over 25 rows x 100 per key -> buckets of 3 rows (plus tail)
    val maxB = sum.agg(org.apache.spark.sql.functions.max(col("bucket_size"))).head().getLong(0)
    assert(maxB === 300L)
  }

  test("targetSize must be positive") {
    import spark.implicits._
    val df = Seq(("k", 1L, 5L)).toDF("key", "id", "sz")
    intercept[IllegalArgumentException] {
      Compaction.planBuckets(df, "key", "id", "sz", 0L)
    }
  }
}
