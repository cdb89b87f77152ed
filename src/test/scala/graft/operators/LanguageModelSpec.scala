package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LanguageModelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("scores match the hand-computed add-k bigram model") {
    val corpus = docs(1L -> "a b a b", 2L -> "a c")
    val (bg, uni) = LanguageModel.trainBigramCounts(corpus, "text")
    // counts: a:3 b:2 c:1 (V=3); "a b":2 "b a":1 "a c":1
    assert(uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(bg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("a b" -> 2L, "b a" -> 1L, "a c" -> 1L))
    val got = LanguageModel.scoreBigrams(corpus, "doc_id", "text", bg, uni, k = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def p(c2: Long, c1: Long) = math.log((c2 + 0.5) / (c1 + 0.5 * 3))
    val d1 = (p(2, 3) + p(1, 2) + p(2, 3)) / 3 // a b, b a, a b
    val d2 = p(1, 3) // a c
    assert(got(1L) === (3L, math.floor(d1 * 10000 + 1e-6).toLong))
    assert(got(2L) === (1L, math.floor(d2 * 10000 + 1e-6).toLong))
  }

  test("likely text scores above garbage under a corpus-trained model") {
    val corpus = docs((1L to 20L).map(i => i -> "the cat sat on the mat near the door"): _*)
    val (bg, uni) = LanguageModel.trainBigramCounts(corpus, "text")
    val probe = docs(100L -> "the cat sat on the mat", 101L -> "mat the door cat zq xv")
    val got = LanguageModel.scoreBigrams(probe, "doc_id", "text", bg, uni)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(100L) > got(101L), got.toString)
  }

  test("short and empty docs score 0 with n_bigrams=0; OOV smooths, never crashes") {
    val corpus = docs(1L -> "x y z")
    val (bg, uni) = LanguageModel.trainBigramCounts(corpus, "text")
    val probe = docs(10L -> "single", 11L -> "", 12L -> "totally unseen words here")
    val got = LanguageModel.scoreBigrams(probe, "doc_id", "text", bg, uni)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(10L) === (0L, 0L))
    assert(got(11L) === (0L, 0L))
    assert(got(12L)._1 === 3L)
    assert(got(12L)._2 < 0L, "OOV bigrams must have negative log-prob")
    intercept[IllegalArgumentException](
      LanguageModel.scoreBigrams(probe, "doc_id", "text", bg, uni, k = 0.0))
  }
}
