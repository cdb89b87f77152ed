package graft

import org.scalatest.funsuite.AnyFunSuite

class SparkEntrySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry() runs the flagship masking pipeline with rows > 0") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0)
    // masked name column: 16-char pseudonyms; passthrough columns intact
    assert(rows.forall(r => r.isNullAt(1) || r.getString(1).length == 16))
    assert(df.schema("c_name").metadata.contains("mask"))
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("all queries run at sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name) // pair queries may legitimately return 0 rows at tiny sf
    }
  }
}
