package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SortedNeighborhoodSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private def run(rows: Seq[(Long, String)], window: Int = 5, maxDist: Int = 2) = {
    import spark.implicits._
    SortedNeighborhood.pairs(rows.toDF("doc_id", "text"), "doc_id", "text",
        window = window, blockLen = 4, maxDist = maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("tail edits meet under the prefix key, head edits under the reversed key") {
    val base = "the quick brown fox jumps over the lazy dog tonight"
    val rows = Seq(
      1L -> base,
      2L -> (base.dropRight(1) + "x"), // tail edit: prefix-sort adjacent
      3L -> ("x" + base.drop(1)), // head edit: only the REVERSED key sorts it next to 1
      4L -> "completely different text about something else entirely",
      5L -> "yet another unrelated document in the corpus today ok")
    val got = run(rows)
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1L), "tail-edit pair missed")
    assert(got.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 1L), "head-edit pair missed")
    assert(!got.exists(p => p._2 == 4L || p._1 == 4L))
  }

  test("candidates are distinct pairs; in-bound dist is true Levenshtein, past-bound is -1") {
    import spark.implicits._
    // identical docs appear in BOTH passes' windows — the pair must
    // surface once, not twice
    val rows = Seq(1L -> "abcdefghij", 2L -> "abcdefghij", 3L -> "abcdefghix",
      4L -> "abcdzzzzzzzzzz") // same block, far past maxDist
    val cand = SortedNeighborhood.candidatesWithDist(
        rows.toDF("doc_id", "text"), "doc_id", "text", window = 5, blockLen = 4,
        maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cand.map(p => (p._1, p._2)).distinct.length === cand.length)
    cand.foreach { case (a, b, d) =>
      val ta = rows.find(_._1 == a).get._2
      val tb = rows.find(_._1 == b).get._2
      val full = lev(ta, tb)
      if (full <= 2) assert(d === full.toLong, s"pair ($a,$b)")
      else assert(d === -1L, s"pair ($a,$b) past the bound must report -1")
    }
    assert(cand.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
    assert(cand.exists(p => p._2 == 4L && p._3 == -1L), "the far doc is a candidate but unmatched")
  }

  test("windows never cross block boundaries (the documented recall trade)") {
    // adjacent in a GLOBAL sort, but different 4-char blocks under BOTH
    // keys (the first test's "aaaa world"/"bbbb world" shares the
    // reversed-key block "dlro" — pass 2 correctly pairs those)
    val rows = Seq(1L -> "aaaa hello xx", 2L -> "bbbb hello yy")
    assert(run(rows, maxDist = 20).isEmpty)
  }

  test("candidate count is n*(window-1)-bounded per pass, never quadratic") {
    import spark.implicits._
    // 40 IDENTICAL docs: an LSH bucket would produce C(40,2)=780 pairs;
    // SNM produces at most n*(w-1) per pass
    val rows = (1L to 40L).map(i => i -> "identical text shared by every document here")
    val cand = SortedNeighborhood.candidatesWithDist(
        rows.toDF("doc_id", "text"), "doc_id", "text", window = 5, blockLen = 4)
      .count()
    assert(cand <= 2 * 40 * 4, s"candidate count $cand exceeds the SNM bound")
    assert(cand >= 39, "adjacent identical docs must at least chain")
  }

  test("null texts are dropped; window=2 degenerates to adjacent-only") {
    import spark.implicits._
    val df = Seq((1L, "abcdefgh"), (2L, "abcdefgx"), (3L, "abcdefxy"))
      .toDF("doc_id", "text")
      .unionByName(Seq((9L, Option.empty[String])).toDF("doc_id", "text"))
    val got = SortedNeighborhood.pairs(df, "doc_id", "text",
        window = 2, blockLen = 4, maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.exists(p => p._1 == 9L || p._2 == 9L))
    // prefix order is 1,2,3: adjacent-only window pairs (1,2),(2,3) — the
    // reversed key may add (1,3) only if those sort adjacent there
    assert(got.contains((1L, 2L)) && got.contains((2L, 3L)))
  }
}
