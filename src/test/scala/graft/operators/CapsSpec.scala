package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CapsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def df(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("grp", "id")
  }

  test("groups under the cap keep every row; over-cap groups keep exactly k") {
    val rows = (1L to 10L).map(i => "big" -> i) ++ Seq("small" -> 100L, "small" -> 101L)
    val out = Caps.capPerGroup(df(rows), Seq("grp"), "id", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out.count(_._1 == "big") === 3)
    assert(out.filter(_._1 == "small").map(_._2) === Set(100L, 101L))
  }

  test("winners are the k smallest (knuth hash, id) — deterministic and nested") {
    val rows = (1L to 20L).map(i => "g" -> i)
    def winners(k: Int): Set[Long] =
      Caps.cappedIds(df(rows), Seq("grp"), "id", k).collect().map(_.getLong(1)).toSet
    val expectedOrder = (1L to 20L).sortBy(i => ((i * 2654435761L) & 0xffffffffL, i))
    assert(winners(5) === expectedOrder.take(5).toSet)
    // nested-cap property: the k=2 winners are inside the k=5 winners
    assert(winners(2).subsetOf(winners(5)))
    // repartitioning must not change the winner set
    val shuffled = Caps.cappedIds(df(rows).repartition(7), Seq("grp"), "id", 5)
      .collect().map(_.getLong(1)).toSet
    assert(shuffled === winners(5))
  }

  test("ids scoped unique only within their group still cap correctly") {
    // id 1..10 exists in BOTH groups; a join-back on the id alone would
    // let one group's winners leak the other group past its cap
    val rows = (1L to 10L).flatMap(i => Seq("a" -> i, "b" -> i))
    val out = Caps.capPerGroup(df(rows), Seq("grp"), "id", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.count(_._1 == "a") === 3)
    assert(out.count(_._1 == "b") === 3)
    // same hash order in both groups -> identical winner id sets
    assert(out.filter(_._1 == "a").map(_._2).toSet ===
      out.filter(_._1 == "b").map(_._2).toSet)
  }

  test("plan shape: bounded-heap aggregate, never a per-group window sort") {
    val rows = (1L to 50L).map(i => "g" -> i)
    val plan = Caps.capPerGroup(df(rows), Seq("grp"), "id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_top_k_by_score"),
      s"expected the TopKByScore aggregate, plan:\n$plan")
    assert(!plan.contains("Window"),
      s"capPerGroup must not window-sort the corpus, plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"winner join-back must broadcast the O(groups x k) set, plan:\n$plan")
  }

  test("null ids and null group keys never win a slot") {
    import spark.implicits._
    val rows = Seq((Some("g"), Some(1L)), (Some("g"), None), (None, Some(2L)), (Some("g"), Some(3L)))
      .toDF("grp", "id")
    val out = Caps.cappedIds(rows, Seq("grp"), "id", 10).collect()
    assert(out.map(_.getLong(1)).toSet === Set(1L, 3L))
  }

  private def tokDf(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("grp", "id", "toks")
  }

  test("token cap keeps the shortest hash-order prefix reaching the budget") {
    import org.apache.spark.sql.functions._
    val rows = (1L to 8L).map(i => ("g", i, 10L)) ++ Seq(("tiny", 100L, 3L))
    val kept = Caps.capTokensPerGroup(tokDf(rows), Seq("grp"), "id", "toks", budget = 35L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // greedy fill of 10-token docs to budget 35: 3 full docs (30) leave
    // room, the 4th straddles and is kept -> exactly 4 kept
    assert(kept.count(_._1 == "g") === 4)
    assert(kept.contains(("tiny", 100L))) // under-budget group keeps all
    // the kept set is the PREFIX of the deterministic hash order
    val order = tokDf(rows).where(col("grp") === "g")
      .orderBy(Sampling.idHash(col("id")), col("id"))
      .collect().map(_.getLong(1)).toSeq
    assert(kept.filter(_._1 == "g").map(_._2) === order.take(4).toSet)
  }

  test("token cap: straddler kept — a single over-budget doc survives") {
    val kept = Caps.capTokensPerGroup(
        tokDf(Seq(("g", 1L, 1000L))), Seq("grp"), "id", "toks", budget = 10L)
      .count()
    assert(kept === 1L)
  }

  test("token cap: null id / group / tokens rows are dropped") {
    import spark.implicits._
    val rows = Seq(
      (Some("g"), Some(1L), Some(5L)), (None, Some(2L), Some(5L)),
      (Some("g"), None, Some(5L)), (Some("g"), Some(3L), None))
      .toDF("grp", "id", "toks")
    val kept = Caps.capTokensPerGroup(rows, Seq("grp"), "id", "toks", budget = 100L)
    assert(kept.count() === 1L)
  }
}
