package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AssemblySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("pieces concatenate in order-key order regardless of input order") {
    import spark.implicits._
    val df = Seq(
      (1L, 30L, "c"), (1L, 10L, "a"), (1L, 20L, "b"),
      (2L, 5L, "solo")).toDF("k", "ts", "piece")
      .repartition(4) // scramble physical order
    val out = Assembly.assemble(df, "k", Seq("ts"), "piece", " | ")
      .orderBy("key").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq === Seq(
      (1L, 3L, "a | b | c"), (2L, 1L, "solo")))
  }

  test("ties on the first order key break on the second") {
    import spark.implicits._
    val df = Seq((1L, 10L, 2L, "second"), (1L, 10L, 1L, "first")).toDF("k", "ts", "seq", "piece")
    val out = Assembly.assemble(df, "k", Seq("ts", "seq"), "piece").collect()
    assert(out(0).getString(2) === "first second")
  }
}
