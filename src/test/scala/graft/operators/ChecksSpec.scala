package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Checks._

class ChecksSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some("a"), 10L, "en"),
      (2L, Some("b"), 20L, "de"),
      (3L, None: Option[String], 500L, "xx"),
      (3L, Some("d"), -5L, "en")).toDF("id", "s", "v", "lang")
  }

  test("each check observes the right metric and pass bit") {
    val out = Checks.run(df, Seq(
      NotNull("s"), Unique("id"), InRange("v", 0L, 100L),
      AcceptedValues("lang", Seq("en", "de")), RowCount(1L, 10L)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    assert(out(("not_null", "s")) === ((1L, 0L))) // one null -> fail
    assert(out(("unique", "id")) === ((1L, 0L))) // one dup -> fail
    assert(out(("in_range", "v")) === ((2L, 0L))) // 500 and -5 out of bounds
    assert(out(("accepted_values", "lang")) === ((1L, 0L))) // "xx"
    assert(out(("row_count", "*")) === ((4L, 1L)))
  }

  test("passing table: all green, allPass true; one aggregate job") {
    import spark.implicits._
    val good = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val checks = Seq(NotNull("s"), Unique("id"), RowCount(1L, 10L))
    val out = Checks.run(good, checks).collect()
    assert(out.forall(_.getLong(5) === 1L))
    assert(Checks.allPass(good, checks))
    assert(!Checks.allPass(good, Seq(RowCount(5L, 10L))))
    // the whole report is one aggregate over one scan: no join, no shuffle
    // beyond the single-row combine
    val plan = Checks.run(good, checks).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("unique ignores nulls (SQL distinct semantics)") {
    import spark.implicits._
    val d = Seq(Some(1L), None, None).map(Tuple1(_)).toDF("id")
    val out = Checks.run(d, Seq(Unique("id"))).head()
    assert(out.getLong(2) === 0L && out.getLong(5) === 1L)
  }

  test("skewReport: top-N by count with string tie-break and integer share") {
    import spark.implicits._
    val d = (Seq.fill(6)("k1") ++ Seq.fill(3)("k2") ++ Seq.fill(3)("k10") ++ Seq("k3"))
      .map(Tuple1(_)).toDF("k")
    val out = Stats.skewReport(d, "k", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ties between k2 and k10 break lexicographically: "k10" < "k2"
    assert(out.toSeq === Seq(("k1", 6L, 6L * 10000 / 13),
      ("k10", 3L, 3L * 10000 / 13), ("k2", 3L, 3L * 10000 / 13)))
  }
}
