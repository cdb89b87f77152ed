package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM trainer, hand-computed end to end on a corpus small enough
  * to run the seeding, the E-step Viterbi, the prune loss, and the final
  * ranking on paper. Corpus: "abab abab ab" / "abab cd ab" →
  * words abab×3, ab×2, cd×1; alphabet {a,b,c,d}.
  *
  * Seeding (len 2..3, multiplicity, minFreq 2): ab f=8 (2 windows in
  * abab ×3 + ab ×2), ba f=3, aba f=3, bab f=3; cd f=1 drops. Scores
  * (f·len): ab 16, aba 9, bab 9, ba 6.
  *
  * Round-1 E-step under {chars, ab, aba, bab, ba}: the DP's
  * ties-to-longest-final rule segments abab as [a, bab] (cost-2 ties
  * "ab|ab", "aba|b", "a|bab" — the last DP cell prefers l=3), ab as
  * [ab], cd as [c, d] → usage a:3, bab:3, ab:2, c:1, d:1.
  *
  * Prune losses (alt = best split cost under the full vocab):
  * bab: 3·(2−1)=3; ab: 2·1=2; aba/ba unused → 0. Keep-1 → bab.
  *
  * Final E-step under {a,b,c,d,bab}: abab → [a, bab], ab → [a, b],
  * cd → [c, d] → usage a:5, bab:3, b:2, c:1, d:1. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "abab abab ab"),
    (2L, "abab cd ab")).toDF("doc_id", "text")

  private def collectOut(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("one EM/prune round reproduces the hand computation exactly") {
    val out = collectOut(Unigram.train(corpus, "text", vocabSize = 5,
      seedSize = 10, maxPieceLen = 3, rounds = 1, minFreq = 2L))
    assert(out === Seq(
      (1L, "a", 1L, 5L),
      (2L, "bab", 3L, 3L),
      (3L, "b", 1L, 2L),
      (4L, "c", 1L, 1L),
      (5L, "d", 1L, 1L)))
  }

  test("the multi-round 3/4 shrink schedule converges to the same target") {
    // round 1 keeps max(1, 4·3/4)=3 pieces (bab, ab, aba by loss/usage/
    // token), round 2 cuts to target — bab survives both paths
    val out = collectOut(Unigram.train(corpus, "text", vocabSize = 5,
      seedSize = 10, maxPieceLen = 3, rounds = 2, minFreq = 2L))
    assert(out.map(_._2) === Seq("a", "bab", "b", "c", "d"))
  }

  test("a target covering every candidate skips pruning; unused pieces rank last") {
    val out = collectOut(Unigram.train(corpus, "text", vocabSize = 8,
      seedSize = 10, maxPieceLen = 3, rounds = 1, minFreq = 2L))
    // usage: a:3, bab:3 (tie → token asc), ab:2, c:1, d:1, then the
    // unused aba/b/ba at zero in token order
    assert(out.map(t => (t._2, t._4)) === Seq(
      ("a", 3L), ("bab", 3L), ("ab", 2L), ("c", 1L), ("d", 1L),
      ("aba", 0L), ("b", 0L), ("ba", 0L)))
  }

  test("single characters always survive; vocabSize below the alphabet is rejected") {
    intercept[IllegalArgumentException] {
      Unigram.train(corpus, "text", vocabSize = 3, seedSize = 10,
        maxPieceLen = 3, rounds = 1)
    }
    val out = collectOut(Unigram.train(corpus, "text", vocabSize = 4,
      seedSize = 10, maxPieceLen = 3, rounds = 1, minFreq = 2L))
    assert(out.map(_._2).toSet === Set("a", "b", "c", "d"))
  }
}
