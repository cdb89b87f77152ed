package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class QualityRulesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def rules(texts: (Long, String)*): Map[Long, Row] = {
    import spark.implicits._
    QualityRules.gopherRules(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private def flag(r: Row, name: String): Boolean = r.getBoolean(r.fieldIndex(name))

  test("a plain English sentence passes every rule") {
    val r = rules(1L -> "the quick brown fox jumps over a lazy dog and rests in the shade")(1L)
    Seq("word_count_ok", "mean_word_len_ok", "symbol_ok", "bullet_ok",
      "ellipsis_ok", "alpha_ok", "stopword_ok", "pass").foreach(f => assert(flag(r, f), f))
  }

  test("bullet-menu docs fail bullet_ok; ellipsis farms fail ellipsis_ok") {
    val bullets = (1 to 10).map(i => s"- item the of $i").mkString("\n")
    val ell = "the a of and to in is fine\n" + (1 to 9).map(_ => "truncated line...").mkString("\n")
    val m = rules(1L -> bullets, 2L -> ell)
    assert(!flag(m(1L), "bullet_ok") && !flag(m(1L), "pass"))
    assert(flag(m(2L), "bullet_ok"))
    assert(!flag(m(2L), "ellipsis_ok") && !flag(m(2L), "pass"))
  }

  test("symbol soup fails symbol_ok; numeric tables fail alpha_ok") {
    val m = rules(
      1L -> "the # of # things # is # large # here # ok # a #",
      2L -> "the table 100 200 300 400 500 600 700 800 of a is")
    assert(!flag(m(1L), "symbol_ok"))
    assert(!flag(m(2L), "alpha_ok"))
  }

  test("boundary arithmetic is exact: 10% symbols passes, just over fails") {
    // 10 words, 1 '#': 1*10 <= 10 passes; 2 '#': 2*10 > 10 fails
    val ten = "the a of and to in is w1 w2 w3"
    val m = rules(1L -> (ten + " #").replaceFirst(" w3", ""), 2L -> (ten.replaceAll(" w[23]", "") + " # #"))
    // doc1: 10 words incl '#', one symbol; doc2: 10 words incl two '#'
    assert(flag(m(1L), "symbol_ok"))
    assert(!flag(m(2L), "symbol_ok"))
  }

  test("mean word length bounds and stopword floor") {
    val m = rules(
      1L -> "a a a a a a",                               // mean 1 < 3
      2L -> "extraordinarily incomprehensible antidisestablishmentarian the of", // mean > 10
      3L -> "quick brown foxes jump high today")          // zero stopwords
    assert(!flag(m(1L), "mean_word_len_ok"))
    assert(!flag(m(2L), "mean_word_len_ok"))
    assert(!flag(m(3L), "stopword_ok"))
  }

  test("rules are one narrow projection: no shuffle, no UDF, pruned scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = QualityRules.gopherRules(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "gopherRules must not shuffle")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "column pruning must reach the scan")
  }

  test("null and empty text fail closed, not crash") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val got = QualityRules.gopherRules(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("pass"))).toMap
    assert(got === Map(1L -> false, 2L -> false, 3L -> false))
  }
}
