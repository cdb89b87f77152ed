package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

class UnicodeFoldSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def fold(s: String): String =
    UnicodeFold.foldAccentsUTF8(UTF8String.fromString(s)).toString

  test("precomposed accents fold to base letters") {
    assert(fold("élève naïve jalapeño über smörgåsbord ça") ===
      "eleve naive jalapeno uber smorgasbord ca")
  }

  test("already-decomposed input folds identically (NFD first)") {
    assert(fold("e\u0301le\u0300ve") === "eleve") // e + combining acute/grave
    assert(fold("o\u0308\u0323") === "o") // stacked marks both stripped
  }

  test("characters without canonical decompositions pass through") {
    assert(fold("ß ø æ Œ ﬁ 中文 عربى") === "ß ø æ Œ ﬁ 中文 عربى")
  }

  test("spacing-combining and enclosing marks strip like utf8proc STRIPMARK") {
    assert(fold("का") === "क") // Devanagari ka + vowel sign aa (Mc)
    assert(fold("a⃝") === "a") // enclosing circle (Me)
  }

  test("Hangul recomposes after the strip (utf8proc pipeline ends in NFC)") {
    assert(fold("한국") === "한국") // '한국' round-trips precomposed
  }

  test("ASCII fast path returns the same buffer uncopied") {
    val in = UTF8String.fromString("plain ascii text 123")
    assert(UnicodeFold.foldAccentsUTF8(in) eq in)
  }

  test("column form matches the kernel inside a plan, null in null out") {
    import spark.implicits._
    val df = Seq(Some("café"), Some("touché"), None)
      .toDF("t")
      .select(UnicodeFold.foldAccents(col("t")).as("f"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some("cafe"), Some("touche"), None))
  }
}
