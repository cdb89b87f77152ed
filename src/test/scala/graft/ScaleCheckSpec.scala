package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the measurement tooling against rot: ScaleCheck's query list must
  * stay a subset of the driver contract, or the scaling artifact silently
  * stops covering what SCALING.md claims. */
class ScaleCheckSpec extends AnyFunSuite {

  test("every ScaleCheck query is a SparkEntry query") {
    val missing = ScaleCheck.queriesUnderTest.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"ScaleCheck references unknown queries: $missing")
    assert(ScaleCheck.queriesUnderTest.nonEmpty)
  }

  test("documentCopies at 104x: no cross-copy text collisions, lengths preserved") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // real-ish sentences incl. a palindromic word ("did") — the trap the
    // word-level transforms must not re-duplicate through
    val docs = Seq(
      (0L, "the cat did sit on the mat tonight"),
      (1L, "a completely different second document body"),
      (2L, "short one")).toDF("doc_id", "text")
    val out = ScaleCheck.documentCopies(docs, 104).cache()
    try {
      assert(out.count() === 3L * 104)
      // every copy of every doc is a distinct string: zero duplicate mass
      assert(out.select("text").distinct().count() === 3L * 104)
      // bijections preserve length (the per-copy cost statistics)
      val lens = out.selectExpr("doc_id % 100000000 AS base", "length(text) AS l")
        .distinct().groupBy("base").count().collect()
      assert(lens.forall(_.getLong(1) === 1L), "a copy changed its text length")
      intercept[IllegalArgumentException](ScaleCheck.documentCopies(docs, 105))
    } finally out.unpersist()
  }
}
