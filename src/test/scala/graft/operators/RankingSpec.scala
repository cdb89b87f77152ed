package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RankingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("bm25 ranks a tiny corpus like the textbook formula") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join hash"),
      (2L, "join window"),
      (3L, "scan scan scan")).toDF("doc_id", "text")
    val out = Ranking.bm25TopK(docs, "doc_id", "text", Seq("hash", "join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // N=3, avgdl=8/3; tf: d1={hash:2, join:1}, d2={join:1}; df: hash=1, join=2
    val (k1, b, n, avgdl) = (1.2, 0.75, 3.0, 8.0 / 3.0)
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def contrib(tf: Double, dl: Double, df: Double) =
      idf(df) * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    val s1 = math.floor((contrib(2, 3, 1) + contrib(1, 3, 2)) * 10000).toLong
    val s2 = math.floor(contrib(1, 2, 2) * 10000).toLong

    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // doc 3 has no query term
    assert(out === Array((1L, 3L, s1), (2L, 2L, s2)))
    assert(s1 > s2)
  }

  test("ties broken by doc_id and k truncates") {
    import spark.implicits._
    val docs = Seq(
      (5L, "alpha beta"),
      (2L, "alpha beta"),
      (9L, "alpha beta")).toDF("doc_id", "text")
    val out = Ranking.bm25TopK(docs, "doc_id", "text", Seq("alpha"), k = 2)
      .collect().map(_.getLong(0))
    assert(out.toSeq === Seq(2L, 5L))
  }

  test("pmiTopK: hand-computed PMI on a tiny corpus, window honored") {
    import spark.implicits._
    // "a b" x3 and "c d" x3, plus "a x c" where a..c is within window 2
    val docs = Seq("a b", "a b", "a b", "c d", "c d", "c d", "a x c")
      .toDF("text")
    val out = Ranking.pmiTopK(docs, "text", window = 2, minCount = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // pairs: (a,b)x3 (c,d)x3 (a,x) (a,c) (c,x) -> minCount 3 keeps (a,b),(c,d)
    assert(out.map(t => (t._1, t._2, t._3)).toSet === Set(("a", "b", 3L), ("c", "d", 3L)))
    // N=15 tokens: a:4 b:3 c:4 d:3 x:1; P=9 pairs
    // pmi(a,b) = ln((3/9)*(15/4)*(15/3)); same for (c,d) by symmetry
    val expected = math.floor(math.log((3.0 / 9) * (15.0 / 4) * (15.0 / 3)) * 10000 + 1e-6).toLong
    assert(out.forall(_._4 === expected))
  }

  test("pmiTopK: window 1 sees only adjacent pairs; empty/null texts ignored") {
    import spark.implicits._
    val docs = Seq(Some("p q r"), Some(""), None).toDF("text")
    val out = Ranking.pmiTopK(docs, "text", window = 1, minCount = 1, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("p", "q"), ("q", "r"))) // (p,r) is distance 2
  }

  test("rrfFuse: exact integer contributions, absent ids contribute zero") {
    import spark.implicits._
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val b = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id", "rank")
    val got = Ranking.rrfFuse(Seq(a, b), k0 = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def c(rank: Long) = 1000000000000L / (60 + rank)
    val expected = Map(
      10L -> (c(1) + c(2), 2L), 20L -> (c(2) + c(1), 2L),
      30L -> (c(3), 1L), 40L -> (c(3), 1L))
    assert(got.map(t => t._1 -> ((t._2, t._3))).toMap === expected)
    // 10 and 20 tie exactly (symmetric ranks) -> smaller id first; the
    // singles tie too, 30 before 40
    assert(got.map(_._1).toSeq === Seq(10L, 20L, 30L, 40L))
  }

  test("rrfFuse: topK cuts after the fused order; k0 bounds hold") {
    import spark.implicits._
    val a = (1L to 9L).map(i => (i, i)).toDF("id", "rank")
    val top = Ranking.rrfFuse(Seq(a), topK = 3).collect().map(_.getLong(0))
    assert(top.toSeq === Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] { Ranking.rrfFuse(Nil) }
  }

  private def evalRow(sys: Seq[(Long, Long)], truth: Seq[(Long, Long)], k: Int) = {
    import spark.implicits._
    val r = Ranking.evalRanking(sys.toDF("vid", "rank"), truth.toDF("vid", "rank"), k)
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("evalRanking: the perfect ranking scores ndcg = mrr = 1e6 exactly") {
    val perfect = (1L to 10L).map(i => (100L + i, i))
    val (dcg, idcg, ndcg, mrr, nRel) = evalRow(perfect, perfect, 10)
    assert(dcg === idcg && ndcg === 1000000L && mrr === 1000000L && nRel === 10L)
  }

  test("evalRanking: a disjoint ranking scores all zeros") {
    val sys = (1L to 10L).map(i => (i, i))
    val truth = (1L to 10L).map(i => (1000L + i, i))
    val (dcg, _, ndcg, mrr, nRel) = evalRow(sys, truth, 10)
    assert(dcg === 0L && ndcg === 0L && mrr === 0L && nRel === 0L)
  }

  test("evalRanking: hand-computed single-hit case") {
    // truth rank 1 (rel = 3) found at system rank 2 with k = 3:
    // dcg = 3 * disc(2), idcg = 3*disc(1) + 2*disc(2) + 1*disc(3), mrr = 1e6 div 2
    val disc = Ranking.dcgDiscountsPpm(3)
    val sys = Seq((7L, 1L), (42L, 2L), (8L, 3L))
    val truth = Seq((42L, 1L), (43L, 2L), (44L, 3L))
    val (dcg, idcg, ndcg, mrr, nRel) = evalRow(sys, truth, 3)
    assert(dcg === 3L * disc(1))
    assert(idcg === 3L * disc(0) + 2L * disc(1) + 1L * disc(2))
    assert(ndcg === dcg * 1000000L / idcg)
    assert(mrr === 500000L && nRel === 1L)
  }

  test("evalRanking: oversized inputs clamp — no ANSI array error, no negative relevance") {
    // system top-20 evaluated at k=10: ranks 11..20 discount to 0 instead
    // of element_at throwing; truth top-20: trank 12 grades 0 instead of
    // rel = -1 corrupting dcg. A hit at system rank 15 is NOT a top-10 hit.
    val sys20 = (1L to 20L).map(i => (100L + i, i))
    val truth20 = (1L to 20L).map(i => (100L + i, i))
    val (dcg, idcg, ndcg, mrr, nRel) = evalRow(sys20, truth20, 10)
    assert(dcg === idcg && ndcg === 1000000L && mrr === 1000000L && nRel === 10L)
    // the only overlap is at truth rank 12 / system rank 15 — everything 0
    val sysLate = (1L to 15L).map(i => (if (i == 15L) 42L else i, i))
    val truthLate = (1L to 20L).map(i => (if (i == 12L) 42L else 1000L + i, i))
    val (d2, _, n2, m2, r2) = evalRow(sysLate, truthLate, 10)
    assert(d2 === 0L && n2 === 0L && m2 === 0L && r2 === 0L)
  }

  test("evalRanking: moving a relevant hit earlier never lowers ndcg (discount monotonicity)") {
    val truth = Seq((42L, 1L))
    def ndcgAt(pos: Long): Long = {
      val sys = (1L to 5L).map(i => (if (i == pos) 42L else i, i))
      evalRow(sys, truth, 5)._3
    }
    val scores = (1L to 5L).map(ndcgAt)
    assert(scores === scores.sorted.reverse, s"ndcg not monotone in position: $scores")
  }
}
