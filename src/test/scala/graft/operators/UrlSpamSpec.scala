package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UrlSpamSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def feats(url: String): Row = {
    import spark.implicits._
    Seq(url).toDF("u")
      .select(UrlSpam.features(col("u")).as("f"))
      .select("f.*").collect()(0)
  }

  test("clean news URL scores low") {
    val r = feats("https://news.example.com/articles/42")
    assert(r.getAs[String]("host") === "news.example.com")
    assert(r.getAs[Long]("n_sub") === 1L)
    assert(r.getAs[Long]("n_hyphen") === 0L)
    assert(r.getAs[Long]("digit_pct") === 0L)
    assert(r.getAs[Long]("path_depth") === 2L)
    assert(r.getAs[Long]("n_params") === 0L)
    assert(r.getAs[Long]("spam_score") === 2L)
  }

  test("tracking-littered URL prices each tracking parameter") {
    val r = feats("https://example.com/p/9?utm_source=feed&fbclid=x9&ref=tw")
    assert(r.getAs[Long]("n_params") === 3L)
    assert(r.getAs[Long]("n_tracking") === 3L)
    // 3 params -> +1 over the 2-param allowance; 3 tracking -> +12
    assert(r.getAs[Long]("spam_score") === 13L)
  }

  test("keyword-stuffed throwaway-TLD host stacks hyphen, length, TLD penalties") {
    val r = feats("http://best-cheap-pills-0.win-prizes-online.example.biz/offer/1")
    assert(r.getAs[Long]("n_hyphen") === 5L)
    assert(r.getAs[Long]("n_sub") === 2L)
    assert(r.getAs[String]("host").length > 40)
    // 3*5 hyphen + 2*2 sub + 0 digit + 0 path + 0 params + 5 length + 6 TLD
    assert(r.getAs[Long]("spam_score") === 30L)
  }

  test("machine-deep path pays past depth 4") {
    val r = feats("https://example.org/a/b/c/d/e/f/g/h/7/page")
    assert(r.getAs[Long]("path_depth") === 10L)
    assert(r.getAs[Long]("spam_score") === 12L)
  }

  test("generated digit host pays digit ratio and subdomain") {
    val r = feats("http://h123x861.example.net/123")
    assert(r.getAs[Long]("n_sub") === 1L)
    assert(r.getAs[Long]("digit_pct") === 30L) // 6 digits / 20 chars
    assert(r.getAs[Long]("spam_score") === 2L + 3L)
  }

  test("non-URL input yields a null struct") {
    import spark.implicits._
    val r = Seq("not a url").toDF("u")
      .select(UrlSpam.features(col("u")).as("f")).collect()(0)
    assert(r.isNullAt(0))
  }
}
