package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.RecordLinkage.FieldRule

class RecordLinkageSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  // (id, name, city, year) toy registry: 1/2 are the same person with a
  // name typo, 3 shares the city only, 4 is unrelated but name-adjacent
  private def people = {
    import spark.implicits._
    Seq(
      (1L, "maria gonzalez", "lisbon", 1984L),
      (2L, "maria gonzales", "lisbon", 1984L), // typo twin of 1
      (3L, "pedro almeida", "lisbon", 1990L),
      (4L, "maria gonzalet", "porto", 1955L), // name-close, everything else off
      (5L, "zhang wei", "harbin", 1971L))
      .toDF("id", "name", "city", "year")
  }

  private val rules = Seq(
    FieldRule("name", (a, b) => levenshtein(a, b, 2) >= 0, 20L, -8L),
    FieldRule("city", (a, b) => a === b, 6L, -6L),
    FieldRule("year", (a, b) => abs(a - b) <= 1L, 8L, -8L))

  private def scores(window: Int = 5, blockLen: Int = 2): Map[(Long, Long), Long] =
    RecordLinkage.fsScores(people, "id", Seq(col("name")), rules,
        window = window, blockLen = blockLen)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap

  test("typo twin scores the full agreement sum; name-only neighbor lands below") {
    val s = scores()
    assert(s((1L, 2L)) === 20L + 6L + 8L, "all three fields agree for the twin")
    // 1 vs 4: lev("maria gonzalez","maria gonzalet")=1 agrees, city/year disagree
    assert(s((1L, 4L)) === 20L - 6L - 8L)
  }

  test("blocking is real: records outside the block prefix never become candidates") {
    val s = scores()
    assert(!s.contains((1L, 5L)) && !s.contains((2L, 5L)),
      "'zhang wei' blocks under 'zh', the marias under 'ma'")
  }

  test("weights must be signed log-odds: wAgree > 0 > wDisagree") {
    intercept[IllegalArgumentException] {
      FieldRule("x", (a, b) => a === b, 0L, -1L)
    }
    intercept[IllegalArgumentException] {
      FieldRule("x", (a, b) => a === b, 1L, 1L)
    }
  }

  test("null fields take the disagreement weight, not a null score") {
    import spark.implicits._
    val df = Seq(
      (1L, "same name", Some("lisbon"), Some(1984L)),
      (2L, "same name", None: Option[String], Some(1984L)))
      .toDF("id", "name", "city", "year")
    val s = RecordLinkage.fsScores(df, "id", Seq(col("name")), rules, blockLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(s((1L, 2L)) === 20L - 6L + 8L)
  }

  test("multi-pass union dedups pairs that meet under both keys") {
    val both = RecordLinkage.fsScores(people, "id",
      Seq(col("name"), reverse(col("name"))), rules, blockLen = 1)
    val pairs = both.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === pairs.distinct.length, "a pair surfaced twice across passes")
  }

  test("n_agree counts the agreement vector") {
    val got = RecordLinkage.fsScores(people, "id", Seq(col("name")), rules, blockLen = 2)
      .where(col("id_a") === 1L && col("id_b") === 2L)
      .select("n_agree").collect().head.getLong(0)
    assert(got === 3L)
  }
}
