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

  test("every queries entry has an oracle (no silent rows-only downgrades)") {
    // the r9 gapfill regression hid because a query could drop out of the
    // correctness report without anything failing; a query with no oracle
    // gets only a weak rows-only check, so adding one must be a conscious,
    // test-visible decision — via this allowlist, not an omission
    val rowsOnlyAllowed = Set.empty[String]
    val missing = SparkEntry.queries.keySet
      .diff(SparkEntry.oracleSql.keySet).diff(rowsOnlyAllowed)
    assert(missing.isEmpty, s"queries without an oracle: $missing")
  }

  test("no query emits unaliased aggregate column names") {
    // the driver's compare sorts columns BY NAME before hashing values, so
    // a Spark column named sum(l_quantity) against an oracle alias sum_qty
    // hash-mismatches even with identical values. Unaliased aggregates are
    // exactly the names containing parens/spaces — ban them structurally.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val badCols = fn(spark, sf).schema.fieldNames
        .filter(c => c.contains("(") || c.contains(" "))
      if (badCols.isEmpty) Nil else Seq(s"$name: ${badCols.mkString(", ")}")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
