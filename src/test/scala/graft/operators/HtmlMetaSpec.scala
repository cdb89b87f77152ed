package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class HtmlMetaSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val page =
    """<html><head>
      |<TITLE> The  Story &amp; the Sequel </TITLE>
      |<meta charset="utf-8">
      |<meta content='A short &quot;description&quot; here.' name=description>
      |<link href="https://a.example.com/canonical" rel="alternate canonical">
      |</head><body><title>not this one? no: body is past the window cut</title></body></html>""".stripMargin

  test("title: first title element, entity-decoded, whitespace-collapsed, case-insensitive") {
    assert(HtmlMeta.title(page) === "The Story & the Sequel")
    assert(HtmlMeta.title("<title></title>") === null)
    assert(HtmlMeta.title("<title>unclosed") === null)
    assert(HtmlMeta.title("no markup at all") === null)
    assert(HtmlMeta.title(null) === null)
  }

  test("description: attribute order and quoting don't matter; og fallback") {
    assert(HtmlMeta.description(page) === "A short \"description\" here.")
    assert(HtmlMeta.description(
      "<meta name=\"DESCRIPTION\" content=\"d1\">") === "d1")
    assert(HtmlMeta.description(
      "<meta property=\"og:description\" content=\"og d\">") === "og d")
    // name=description wins over og even when og comes first
    assert(HtmlMeta.description(
      "<meta property=\"og:description\" content=\"og d\">" +
        "<meta name=description content=real>") === "real")
    assert(HtmlMeta.description("<meta name=\"keywords\" content=\"x\">") === null)
    // a whitespace-only name=description does NOT consume the slot — a
    // later og:description still applies (advisor r17)
    assert(HtmlMeta.description(
      "<meta name=description content=\"   \">" +
        "<meta property=\"og:description\" content=\"og d\">") === "og d")
  }

  test("canonical: rel is a token list; href required") {
    assert(HtmlMeta.canonical(page) === "https://a.example.com/canonical")
    assert(HtmlMeta.canonical("<link rel=canonical href=https://b.io/x>") === "https://b.io/x")
    assert(HtmlMeta.canonical("<link rel=\"stylesheet\" href=\"/s.css\">") === null)
    assert(HtmlMeta.canonical("<link rel=canonical>") === null)
  }

  test("head window: metadata after </head> is not read") {
    val html = "<head><title>real</title></head><body>" +
      "<link rel=canonical href=https://late.example.com/x>" +
      "<meta name=description content=late></body>"
    assert(HtmlMeta.title(html) === "real")
    assert(HtmlMeta.canonical(html) === null)
    assert(HtmlMeta.description(html) === null)
  }

  test("totality: malformed markup never throws") {
    Seq("<title", "<meta name=", "<link rel='unclosed", "<<<>>", "<!-- <title>x</title> -->",
      "<meta " + "a" * 40000)
      .foreach { s => HtmlMeta.title(s); HtmlMeta.description(s); HtmlMeta.canonical(s) }
    // a commented-out title is not a title
    assert(HtmlMeta.title("<!-- <title>x</title> --><title>y</title>") === "y")
  }

  test("robots meta: first name=robots content, any case/order; absent is null") {
    assert(HtmlMeta.robotsContent(
      "<head><meta content=\"noindex, nofollow\" name=ROBOTS></head>") === "noindex, nofollow")
    assert(HtmlMeta.robotsContent("<meta name=robots content=\"  all \">") === "all")
    assert(HtmlMeta.robotsContent("<meta name=viewport content=\"w=1\">") === null)
    // googlebot-scoped meta is NOT name=robots — closed contract
    assert(HtmlMeta.robotsContent("<meta name=googlebot content=noindex>") === null)
    assert(HtmlMeta.robotsContent(null) === null)
    // codegen column agrees
    import spark.implicits._
    val r = Seq("<meta name=robots content=noindex>", "plain").toDF("h")
      .select(HtmlMeta.htmlRobots(col("h"))).collect()
    assert(r(0).getString(0) === "noindex")
    assert(r(1).isNullAt(0))
  }

  test("feed autodiscovery: rel token + type filter, document order, decoys skipped") {
    val page = "<head>" +
      "<link rel=\"stylesheet\" href=\"/s.css\">" +
      "<link rel=\"alternate\" type=\"application/rss+xml\" href=\"/feed.xml\">" +
      "<link rel=\"ALTERNATE home\" type=\"Application/Atom+XML\" href=\"/atom.xml\">" +
      "<link rel=\"alternate\" type=\"text/html\" href=\"/amp.html\">" +
      "<link rel=\"alternate\" type=\"application/rss+xml\">" + // no href
      "</head>"
    assert(HtmlMeta.feedLinks(page) === Seq("/feed.xml", "/atom.xml"))
    assert(HtmlMeta.feedLinks("<head><title>t</title></head>") === Seq.empty)
    assert(HtmlMeta.feedLinks(null) === null)
    // codegen column agrees
    import spark.implicits._
    val r = Seq(page, "plain").toDF("h")
      .select(HtmlMeta.htmlFeedLinks(col("h"))).collect()
    assert(r(0).getSeq[String](0) === Seq("/feed.xml", "/atom.xml"))
    assert(r(1).getSeq[String](0) === Seq.empty)
  }

  test("codegen'd columns agree with the kernels") {
    import spark.implicits._
    val pages = Seq(page, "<title>t2</title>", "plain", "")
    val out = pages.toDF("html").select(
      HtmlMeta.htmlTitle(col("html")).as("t"),
      HtmlMeta.htmlDescription(col("html")).as("d"),
      HtmlMeta.htmlCanonical(col("html")).as("c")).collect()
    assert(out.map(_.getString(0)).toSeq === pages.map(HtmlMeta.title))
    assert(out.map(_.getString(1)).toSeq === pages.map(HtmlMeta.description))
    assert(out.map(_.getString(2)).toSeq === pages.map(HtmlMeta.canonical))
  }
}
