package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PageDateSpec extends AnyFunSuite {

  test("ladder order: meta beats time beats url") {
    val metaHtml = "<html><head><meta property=\"article:published_time\" " +
      "content=\"2026-03-05T10:00:00Z\"></head><body>" +
      "<time datetime=\"2025-01-01\">x</time></body></html>"
    assert(PageDate.extract("https://e.com/2024/12/31/post", metaHtml) === ("meta", "2026-03-05"))
    val timeHtml = "<html><body><p>intro</p><time datetime=\"2025-01-01T08:30:00+01:00\">Jan 1</time></body></html>"
    assert(PageDate.extract("https://e.com/2024/12/31/post", timeHtml) === ("time", "2025-01-01"))
    assert(PageDate.extract("https://e.com/2024/12/31/post", "<html><body>no dates</body></html>") ===
      ("url", "2024-12-31"))
    assert(PageDate.extract("https://e.com/about", "<p>none</p>") === (null, null))
  }

  test("meta name=date and attribute-order/quoting variants hit") {
    assert(PageDate.extract(null,
      "<meta content='2020-07-04' name=DATE>") === ("meta", "2020-07-04"))
    assert(PageDate.extract(null,
      "<META PROPERTY=\"article:published_time\" CONTENT=\"1999-12-31\">") === ("meta", "1999-12-31"))
  }

  test("invalid dates fall through the ladder, not out of it") {
    // month 13 in meta -> time rung wins
    val html = "<meta name=date content=\"2026-13-01\">" +
      "<time datetime=\"2026-11-30\">ok</time>"
    assert(PageDate.extract(null, html) === ("time", "2026-11-30"))
    // bad meta AND bad time -> url
    val bad = "<meta name=date content=\"2026-13-01\"><time datetime=\"n/a\">x</time>"
    assert(PageDate.extract("https://e.com/2021/02/03/x", bad) === ("url", "2021-02-03"))
    // year out of the 1990-2099 window rejected
    assert(PageDate.extract("https://e.com/1800/01/01/x", null) === (null, null))
  }

  test("url rung: full /YYYY/MM/DD/ segments only, query excluded") {
    assert(PageDate.urlDate("https://e.com/blog/2022/06/15/title") === "2022-06-15")
    assert(PageDate.urlDate("https://e.com/blog/2022/06/15") === "2022-06-15")
    assert(PageDate.urlDate("https://e.com/2022/06/") === null) // no day
    assert(PageDate.urlDate("https://e.com/x?d=/2022/06/15/") === null)
    assert(PageDate.urlDate("https://e.com/12345/06/15/") === null)
    assert(PageDate.urlDate(null) === null)
  }

  test("body window bounds the time scan") {
    val far = "x" * (PageDate.BodyWindow + 100) + "<time datetime=\"2025-05-05\">t</time>"
    assert(PageDate.extract(null, far) === (null, null))
  }

  test("expression path: codegen column agrees with the kernel; null handling") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val rows = Seq(
      ("https://e.com/2024/12/31/p", "<p>no date</p>"),
      (null: String, "<meta name=date content=\"2020-07-04\">"),
      ("https://e.com/about", null: String))
      .toDF("url", "html")
      .select(PageDate.pageDate(col("url"), col("html")).as("d"))
      .select(col("d.date_src"), col("d.pub_date")).collect()
    assert(rows(0).getString(0) === "url" && rows(0).getString(1) === "2024-12-31")
    assert(rows(1).getString(0) === "meta" && rows(1).getString(1) === "2020-07-04")
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("fuzz: random html never throws") {
    val rnd = new scala.util.Random(7)
    val alphabet = "<meta time datetime content=2026- \"'>/"
    (1 to 200).foreach { _ =>
      val s = (1 to 50).map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
      PageDate.extract(s, s) // must not throw
    }
  }
}
