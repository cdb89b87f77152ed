package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MainContentSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val article1 = "The story of this page is told in the text and a reader is sure to enjoy it."
  private val article2 = "A second paragraph of the article adds to the mass and is kept in the extraction."

  private def page(id: Long): String =
    "<html><head><title>t</title><style>p{color:red}</style>" +
      "<script>var x = 1 < 2;</script></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></nav>" +
      s"<header><h1>Site $id</h1></header>" +
      s"<article><p>$article1</p><p>$article2</p></article>" +
      "<aside>Related: <a href=\"/x\">link one</a> <a href=\"/y\">link two</a></aside>" +
      s"<footer>Copyright 2026 site$id — all rights reserved</footer>" +
      "</body></html>"

  test("planted page: nav/header/aside/footer dropped, article kept verbatim") {
    assert(MainContent.extract(page(7)) === article1 + "\n" + article2)
    assert(MainContent.extract(null) === null)
    assert(MainContent.extract("") === "")
  }

  test("gate arms: boilerplate container, link density, length, stopwords") {
    // outside any container, long enough, stopwordy, no links -> kept
    val good = "<div>" + article1 + "</div>"
    assert(MainContent.extract(good) === article1)
    // the same text inside <nav> -> dropped (semantic container wins)
    assert(MainContent.extract("<nav><div>" + article1 + "</div></nav>") === "")
    // link-heavy block: anchor mass > 1/3 of non-ws mass -> dropped
    val linky = "<div>read <a href=\"/a\">the full archive of the articles in here</a></div>"
    assert(MainContent.extract(linky) === "")
    // short block -> dropped even with stopwords
    assert(MainContent.extract("<p>the a of and</p>") === "")
    // long but stopword-free (a code dump / symbol soup) -> dropped
    assert(MainContent.extract("<p>x1 y2 z3 q4 r5 s6 t7 u8 v9 w10 aa bb cc dd</p>") === "")
  }

  test("script/style payloads and comments never leak into blocks") {
    val html = "<body><script>if (a < b) { nav(); }</script><!-- the of and to in is -->" +
      "<p>" + article1 + "</p><style>.x{}</style></body>"
    assert(MainContent.extract(html) === article1)
  }

  test("totality: malformed markup never throws, plain text is one block") {
    assert(MainContent.extract(article1) === article1)
    MainContent.extract("<p><div><<<>>></p junk <a <nav>")
    MainContent.extract("<script>never closed")
    MainContent.extract("<nav>never closed " + article1)
    // unbalanced closes clamp at zero depth rather than going negative
    assert(MainContent.extract("</nav></footer><p>" + article1 + "</p>") === article1)
  }

  test("entities decode exactly like stripMarkup (&amp; last)") {
    val html = "<p>the a&amp;b of &lt;tags&gt; is to be shown in &quot;quotes&quot; and &amp;lt; stays</p>"
    assert(MainContent.extract(html) ===
      "the a&b of <tags> is to be shown in \"quotes\" and &lt; stays")
  }

  test("quality law: extraction improves Gopher-style quality vs tag-stripping on boilerplate pages") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, page(i))).toDF("id", "html")
      .withColumn("stripped", TextAnalysis.stripMarkup(col("html")))
      .withColumn("extracted", MainContent.mainContent(col("html")))
    // the planted boilerplate (nav labels, footer line, link lists) is in
    // the stripped arm and NOT in the extracted arm
    val row = df.agg(
      count(when(col("stripped").contains("Home About Contact"), 1)).as("strip_has_nav"),
      count(when(col("extracted").contains("Home"), 1)).as("ext_has_nav"),
      count(when(col("extracted") === lit(article1 + " " + article2) ||
        col("extracted") === lit(article1 + "\n" + article2), 1)).as("ext_exact")).collect()(0)
    assert(row.getLong(0) === 40L, "stripMarkup keeps the nav text")
    assert(row.getLong(1) === 0L, "extraction drops the nav text")
    assert(row.getLong(2) === 40L, "extraction is exactly the article")
    // the Gopher stopword-fraction rule: the boilerplate tokens dilute the
    // stripped arm (346 per mille) below a 450-per-mille bar the extracted
    // arm clears (529) — boilerplate removal turns a Gopher REJECT into a
    // KEEP on the same pages
    def keeps(textCol: String): Long =
      TextAnalysis.qualityDecision(df, "id", textCol, minTokens = 10,
          minStopFrac_x1e3 = 450)
        .agg(sum(col("keep"))).collect()(0).getLong(0)
    assert(keeps("extracted") === 40L, "every extracted article passes Gopher")
    assert(keeps("stripped") === 0L, "every tag-stripped page fails the stopword rule")
  }

  test("codegen'd column agrees with the kernel") {
    import spark.implicits._
    val htmls = Seq(page(1), "<p>" + article1 + "</p>", "plain " + article1, "", "<nav>x</nav>")
    val out = htmls.toDF("html")
      .select(MainContent.mainContent(col("html")).as("m")).collect().map(_.getString(0))
    assert(out.toSeq === htmls.map(MainContent.extract))
  }
}
