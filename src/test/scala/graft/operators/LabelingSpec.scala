package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LabelingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def vote(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Labeling.majorityVote(rows.toDF("example_id", "label"), "example_id", "label")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
  }

  test("clean majority, outvote, and unanimous cases") {
    val out = vote(Seq(
      1L -> "cat", 1L -> "cat", 1L -> "dog", // 2-1 majority
      2L -> "cat", 2L -> "cat", 2L -> "cat", // unanimous
      3L -> "dog"))                          // single vote
    // (label, n_votes, n_labels, top_n, n_top, agreement_x1e4)
    assert(out(1L) === (("cat", 3L, 2L, 2L, 1L, 6666L)))
    assert(out(2L) === (("cat", 3L, 1L, 3L, 1L, 10000L)))
    assert(out(3L) === (("dog", 1L, 1L, 1L, 1L, 10000L)))
  }

  test("ties break to the lexicographically smallest top label and are flagged") {
    val out = vote(Seq(
      1L -> "b", 1L -> "a",                  // 1-1 tie -> 'a', n_top=2
      2L -> "c", 2L -> "b", 2L -> "a",       // 3-way tie -> 'a', n_top=3
      3L -> "b", 3L -> "b", 3L -> "a"))      // no tie
    assert(out(1L) === (("a", 2L, 2L, 1L, 2L, 5000L)))
    assert(out(2L) === (("a", 3L, 3L, 1L, 3L, 3333L)))
    assert(out(3L) === (("b", 3L, 2L, 2L, 1L, 6666L)))
  }

  test("annotatorReport: agreement vs majority, contested examples excluded") {
    import spark.implicits._
    val votes = Seq(
      // example 1: majority 'cat' (2-1); ann 3 dissents
      (1L, 1L, "cat"), (1L, 2L, "cat"), (1L, 3L, "dog"),
      // example 2: unanimous
      (2L, 1L, "cat"), (2L, 2L, "cat"), (2L, 3L, "cat"),
      // example 3: 1-1 tie -> excluded from every annotator's stats
      (3L, 1L, "a"), (3L, 2L, "b"))
      .toDF("example_id", "annotator", "label")
    val out = Labeling.annotatorReport(votes, "example_id", "annotator", "label")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      1L -> ((2L, 2L, 10000L)),
      2L -> ((2L, 2L, 10000L)),
      3L -> ((2L, 1L, 5000L)))) // example 3 dropped: 2 votes counted, 1 hit
  }

  test("two exchanges: pair-count shuffle, then example re-cluster; window+fold share the second") {
    import spark.implicits._
    val df = Seq(1L -> "a", 1L -> "b", 2L -> "a").toDF("example_id", "label")
    val plan = Labeling.majorityVote(df, "example_id", "label")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected at most two shuffles, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "majorityVote must not join")
  }

  test("fleissStats matches the textbook kappa on a hand-computed panel") {
    import spark.implicits._
    // items 1-3 have the full 3-rater panel; item 4 is partial -> dropped
    val votes = Seq(
      1L -> "a", 1L -> "a", 1L -> "a",
      2L -> "a", 2L -> "a", 2L -> "b",
      3L -> "a", 3L -> "b", 3L -> "c",
      4L -> "a", 4L -> "a").toDF("example_id", "label")
    val r = Labeling.fleissStats(votes, "example_id", "label", nRaters = 3).head()
    // N=3, Nn=9, S2 = 9+5+3 = 17, c = (a:6, b:2, c:1) -> C2 = 41
    assert(r.getLong(r.fieldIndex("n_items")) === 3L)
    assert(r.getLong(r.fieldIndex("n_raters")) === 3L)
    assert(r.getLong(r.fieldIndex("n_dropped")) === 1L)
    assert(r.getLong(r.fieldIndex("s2_sum")) === 17L)
    assert(r.getLong(r.fieldIndex("cj2_sum")) === 41L)
    // kappa = (Pbar - Pe)/(1 - Pe) = (4/9 - 41/81)/(40/81) = -1/8
    assert(r.getLong(r.fieldIndex("kappa_num")) === -10L)
    assert(r.getLong(r.fieldIndex("kappa_den")) === 80L)
  }

  test("fleissStats: unanimous single-label panel has kappa_den = 0 (undefined)") {
    import spark.implicits._
    val votes = Seq(1L -> "a", 1L -> "a", 2L -> "a", 2L -> "a")
      .toDF("example_id", "label")
    val r = Labeling.fleissStats(votes, "example_id", "label", nRaters = 2).head()
    // Pe = 1: agreement is guaranteed by the marginal, kappa undefined
    assert(r.getLong(r.fieldIndex("kappa_den")) === 0L)
    assert(r.getLong(r.fieldIndex("n_items")) === 2L)
  }
}
