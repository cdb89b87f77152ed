package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

class PhraseMatchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def hits(text: String, phrases: String*): Long =
    PhraseMatch.automaton(phrases).countHits(UTF8String.fromString(text))

  test("whole-token matching, not substring: 'cat' does not hit 'catalog'") {
    assert(hits("the catalog of cats and a cat", "cat") === 1L)
    assert(hits("scatter cat concatenate", "cat") === 1L)
  }

  test("multi-word phrases match token sequences across punctuation/case") {
    assert(hits("Big Table, big-table and BIG  \t TABLE", "big table") === 3L)
    assert(hits("a bigtable is one token", "big table") === 0L)
  }

  test("boundary-sharing overlaps all count") {
    assert(hits("table table table", "table table") === 2L)
    assert(hits("a a a a", "a a") === 3L)
  }

  test("a token participates in hits for several phrases at once") {
    assert(hits("slow query plan", "slow query", "query plan", "query") === 3L)
  }

  test("matches at the very start and very end of the text") {
    assert(hits("stream of data ends with stream", "stream") === 2L)
    assert(hits("stream", "stream") === 1L)
  }

  test("multibyte characters act as token separators") {
    assert(hits("café streaméstream", "stream") === 2L)
  }

  test("digits are token characters") {
    assert(hits("error 404 page; error 4042", "error 404") === 1L)
  }

  test("empty-normalization phrases and oversized lists are rejected") {
    intercept[IllegalArgumentException] { PhraseMatch.automaton(Seq("!!!")) }
    intercept[IllegalArgumentException] { PhraseMatch.automaton(Seq.empty) }
    intercept[IllegalArgumentException] {
      PhraseMatch.automaton(Seq.tabulate(30000)(i => s"word$i extra tokens here"))
    }
  }

  test("per-row cost is automaton-driven: 2k-phrase list matches in one pass") {
    val phrases = Seq.tabulate(2000)(i => s"phrase$i token$i") :+ "needle word"
    val ac = PhraseMatch.automaton(phrases)
    assert(ac.countHits(UTF8String.fromString(
      "hay hay needle word hay phrase7 token7")) === 2L)
  }

  test("column form inside a plan agrees with the kernel, null-safe") {
    import spark.implicits._
    val df = Seq(Some("big table stream"), Some("no match here"), None).toDF("t")
      .select(PhraseMatch.phraseHits(col("t"), Seq("big table", "stream")).as("h"))
    assert(df.collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq ===
      Seq(2L, 0L, -1L))
  }
}
