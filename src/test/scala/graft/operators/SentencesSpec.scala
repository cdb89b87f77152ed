package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SentencesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def split(text: String): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(Sentences.splitSentences(col("t")).as("s"))
      .collect()(0).getSeq[String](0)
  }

  test("plain terminators split; trailing unterminated text is a sentence") {
    assert(split("One here. Two there! Three maybe? four trails") ===
      Seq("One here.", "Two there!", "Three maybe?", "four trails"))
  }

  test("abbreviations and dotted pairs never end a sentence") {
    assert(split("Dr. Smith met Mrs. Jones. They left.") ===
      Seq("Dr. Smith met Mrs. Jones.", "They left."))
    assert(split("Use tools e.g. hammers i.e. bluntly. Next.") ===
      Seq("Use tools e.g. hammers i.e. bluntly.", "Next."))
    // protected periods are RESTORED in the output
    assert(split("Inc. was cited.")(0).contains("Inc."))
  }

  test("decimal points stay inside their sentence") {
    assert(split("Pi is 3.14 about. Yes.") ===
      Seq("Pi is 3.14 about.", "Yes."))
  }

  test("closing quotes/brackets ride with the terminator") {
    assert(split("He said \"go.\" She did! (Done?) End") ===
      Seq("He said \"go.\"", "She did!", "(Done?)", "End"))
  }

  test("CJK terminators split with no whitespace required") {
    assert(split("句子一。这是第二句！第三句？尾巴") ===
      Seq("句子一。", "这是第二句！", "第三句？", "尾巴"))
  }

  test("mixed-script boundary: latin terminator before CJK text") {
    assert(split("Was it v2? 句子。tail") ===
      Seq("Was it v2?", "句子。", "tail"))
  }

  test("empty / null / whitespace-only inputs") {
    assert(split("") === Seq.empty)
    assert(split("   ") === Seq.empty)
    assert(split("no terminators at all") === Seq("no terminators at all"))
  }

  test("multiple spaces and newlines at a boundary are consumed") {
    assert(split("First.   \n  Second.") === Seq("First.", "Second."))
  }
}
