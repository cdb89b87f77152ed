package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Interpolated Kneser–Ney laws. The oracle pins exact values; these
  * specs pin the PROPERTIES that make the construction KN at all. */
class LanguageModelKnSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def corpus(rows: String*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t")
  }

  /** p3 of a single trigram "w1 w2 w3" under the model, recovered from
    * the 1e4 log grid (exp of the gridded average — ±1e-4 relative). */
  private def p3(model: LanguageModel.KnModel, w1: String, w2: String,
                 w3: String): Double = {
    val doc = corpus(s"$w1 $w2 $w3")
    val r = LanguageModel.scoreKneserNey(doc, "doc_id", "t", model).collect()(0)
    assert(r.getLong(1) === 1L)
    math.exp(r.getLong(2).toDouble / 10000.0)
  }

  private lazy val model = LanguageModel.trainKneserNey(corpus(
    "the cat sat on the mat",
    "the cat ran on the grass",
    "a dog sat on a rug",
    "san francisco hosts the bridge"), "t")

  test("probability mass: sum over vocab + OOV is 1 for seen and unseen contexts") {
    val vocab = Seq("the", "cat", "sat", "ran", "on", "mat", "grass", "a",
      "dog", "rug", "san", "francisco", "hosts", "bridge")
    for ((w1, w2) <- Seq(("the", "cat"), ("on", "the"), ("cat", "unseenmid"),
                         ("neverseen", "context"))) {
      val mass = vocab.map(p3(model, w1, w2, _)).sum + p3(model, w1, w2, "totallyoov")
      // the 1e4 log grid costs ~1e-4 relative per term
      assert(math.abs(mass - 1.0) < 0.01, s"mass for ($w1, $w2) was $mass")
    }
  }

  test("KN continuation: frequent-but-predictable words get tiny backoff mass") {
    // 'francisco' and 'the' both appear; 'francisco' only ever follows
    // 'san', so under an UNSEEN context its (continuation-count) backoff
    // probability must be far below 'the''s (the motivating example of
    // Kneser & Ney 1995)
    val pFrancisco = p3(model, "neverseen", "context", "francisco")
    val pThe = p3(model, "neverseen", "context", "the")
    assert(pThe > pFrancisco * 2)
  }

  test("higher evidence scores higher: seen trigram > unseen trigram in seen context > OOV") {
    val seenTri = p3(model, "the", "cat", "sat")
    val unseenTri = p3(model, "the", "cat", "bridge")
    val oov = p3(model, "the", "cat", "totallyoov")
    assert(seenTri > unseenTri)
    assert(unseenTri > oov)
    assert(oov > 0)
  }

  test("short documents: <3 tokens score (0, 0)") {
    val r = LanguageModel.scoreKneserNey(corpus("two words"), "doc_id", "t", model)
      .collect()(0)
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L)
  }

  test("train/score split determinism: same inputs, same grid scores") {
    val docs = corpus("the cat sat on the mat", "a dog ran on grass here")
    val a = LanguageModel.scoreKneserNey(docs, "doc_id", "t", model)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = LanguageModel.scoreKneserNey(docs, "doc_id", "t", model)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a === b)
  }
}
