package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ProfileSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("one row per column with counts and string min/max; floats hide min/max by default") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), Some(1.5)),
      (2L, Some("a"), None),
      (3L, None, Some(0.25)),
      (3L, Some("a"), Some(9.0))).toDF("id", "s", "x")
    val out = Profile.profileColumns(df, Seq("id", "s", "x"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5))))).toMap
    assert(out("id") === ((4L, 0L, 3L, Some("1"), Some("3"))))
    assert(out("s") === ((4L, 1L, 2L, Some("a"), Some("b"))))
    // double column: counts still profiled, min/max suppressed (engine-
    // specific float formatting must not leak into a comparable report)
    assert(out("x") === ((4L, 1L, 3L, None, None)))
  }

  test("approx distinct path stays within HLL tolerance of exact") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong % 500, s"s${i % 37}")).toDF("id", "s")
    val approx = Profile.profileColumns(df, Seq("id", "s"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL++ default rsd 5%: 500 and 37 distincts must land well inside 10%
    assert(math.abs(approx("id") - 500L) <= 50, s"got ${approx("id")}")
    assert(math.abs(approx("s") - 37L) <= 4, s"got ${approx("s")}")
  }

  test("single aggregation pass: exactly one scan of the input") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profile.profileColumns(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    // the local relation must appear once — profiling must not re-scan
    // per column (Expand for multi-distinct is fine; re-reads are not)
    assert("LocalTableScan".r.findAllIn(plan).size <= 1, s"plan:\n$plan")
  }

  test("unknown column and empty list are rejected loudly") {
    import spark.implicits._
    val df = Seq(Tuple1(1L)).toDF("id")
    intercept[IllegalArgumentException](Profile.profileColumns(df, Seq("nope")))
    intercept[IllegalArgumentException](Profile.profileColumns(df, Seq.empty))
  }

  test("quote/backtick column names are rejected loudly, not a ParseException") {
    import spark.implicits._
    val df = Seq(Tuple1(1L)).toDF("a`b")
    val e = intercept[IllegalArgumentException](Profile.profileColumns(df, Seq("a`b")))
    assert(e.getMessage.contains("alias it first"))
    // trailing backslash would escape the generated literal's closing quote
    val df2 = Seq(Tuple1(1L)).toDF("a\\")
    intercept[IllegalArgumentException](Profile.profileColumns(df2, Seq("a\\")))
  }
}
