package graft.sources

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SitemapSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("urlset round-trip: loc + lastmod, gz and plain, entity escaping") {
    val urls = Seq(
      ("https://a.example.com/p?x=1&y=2", "2026-01-05"),
      ("https://a.example.com/q", null),
      ("https://b.example.com/r<odd>'\"", "2026-02-11T08:00:00Z"))
    for (bytes <- Seq(Sitemap.writeUrlset(urls), Sitemap.gzip(Sitemap.writeUrlset(urls)))) {
      val got = Sitemap.parse(bytes)
      assert(got.map(e => (e.loc, e.lastmod)) === urls)
      assert(got.forall(e => e.kind == "url" && !e.truncated))
    }
  }

  test("sitemapindex: children come back as kind=sitemap") {
    val kids = Seq("https://a.example.com/sitemap-1.xml.gz", "https://a.example.com/sitemap-2.xml")
    val got = Sitemap.parse(Sitemap.writeIndex(kids))
    assert(got.map(_.loc) === kids)
    assert(got.forall(_.kind == "sitemap"))
  }

  test("<url> never matches <urlset>; attributes and whitespace tolerated") {
    val xml = ("""<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""" +
      """<url ><loc> https://h.example.com/x </loc><lastmod>2026-03-01</lastmod></url></urlset>""")
      .getBytes(StandardCharsets.UTF_8)
    val got = Sitemap.parse(xml)
    assert(got === Seq(Sitemap.Entry("url", "https://h.example.com/x", "2026-03-01", null, null, false)))
  }

  test("published limits: URL cap truncates loudly, never throws") {
    val many = (1 to Sitemap.MaxUrls + 5).map(i => (s"https://h.example.com/$i", null))
    val got = Sitemap.parse(Sitemap.writeUrlset(many))
    assert(got.length === Sitemap.MaxUrls)
    assert(got.forall(_.truncated), "every row must carry the truncation flag")
  }

  test("malformed documents: parse stops at the failure point, never throws") {
    // unclosed block: keep the entries before it
    val broken = ("<urlset><url><loc>https://a.example.com/1</loc></url>" +
      "<url><loc>https://a.example.com/2").getBytes(StandardCharsets.UTF_8)
    assert(Sitemap.parse(broken).map(_.loc) === Seq("https://a.example.com/1"))
    // block without a loc is skipped, not emitted
    val noLoc = ("<urlset><url><lastmod>2026-01-01</lastmod></url>" +
      "<url><loc>https://a.example.com/3</loc></url></urlset>").getBytes(StandardCharsets.UTF_8)
    assert(Sitemap.parse(noLoc).map(_.loc) === Seq("https://a.example.com/3"))
    // non-sitemap XML, garbage, corrupt gzip, null: all empty
    assert(Sitemap.parse("<html><body>nope</body></html>".getBytes) === Nil)
    assert(Sitemap.parse("total garbage".getBytes) === Nil)
    val gz = Sitemap.gzip(Sitemap.writeUrlset(Seq(("https://a.example.com/x", null))))
    gz(gz.length - 3) = (gz(gz.length - 3) ^ 0x5a).toByte
    Sitemap.parse(gz) // must not throw
    assert(Sitemap.parse(null) === Nil)
  }

  test("decodeEntities: named, numeric, hex, garbage passthrough") {
    assert(Sitemap.decodeEntities("a&amp;b&lt;c&gt;d&quot;e&apos;f") === "a&b<c>d\"e'f")
    assert(Sitemap.decodeEntities("x&#65;y&#x42;z") === "xAyBz")
    assert(Sitemap.decodeEntities("broken &nosuch; &#zz; &") === "broken &nosuch; &#zz; &")
  }

  test("entriesDF: narrow flatten over a (sitemap_id, content) frame") {
    import spark.implicits._
    val a = Sitemap.writeUrlset(Seq(("https://a.example.com/1", "2026-01-02")))
    val b = Sitemap.gzip(Sitemap.writeIndex(Seq("https://b.example.com/sm.xml")))
    val rows = Sitemap.entriesDF(Seq((1L, a), (2L, b)).toDF("sitemap_id", "content"))
      .collect().sortBy(_.getLong(0))
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq === Seq(
      (1L, "url", "https://a.example.com/1"),
      (2L, "sitemap", "https://b.example.com/sm.xml")))
    assert(rows(0).getString(3) === "2026-01-02")
  }

  test("scheduling fields: changefreq and priority round-trip; absent -> null") {
    val bytes = Sitemap.writeUrlsetFull(Seq(
      ("https://a.example.com/1", "2026-02-03", "weekly", "0.8"),
      ("https://a.example.com/2", null, null, null)))
    val got = Sitemap.parse(bytes)
    assert(got.map(e => (e.loc, e.lastmod, e.changefreq, e.priority)) === Seq(
      ("https://a.example.com/1", "2026-02-03", "weekly", "0.8"),
      ("https://a.example.com/2", null, null, null)))
  }

  test("crawlDelay: group scoping, conservative merge, named beats *") {
    import graft.operators.Robots
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: 2\n", "bot") === 2.0)
    assert(Robots.crawlDelay(
      "User-agent: bot\nCrawl-delay: 5\nUser-agent: *\nCrawl-delay: 1\n", "bot") === 5.0)
    // two matching groups -> the LARGEST (most polite) delay wins
    assert(Robots.crawlDelay(
      "User-agent: bot\nCrawl-delay: 2\n\nUser-agent: bot\nCrawl-delay: 7\n", "bot") === 7.0)
    assert(Robots.crawlDelay("User-agent: *\nDisallow: /x\n", "bot") === null)
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: junk\n", "bot") === null)
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: -3\n", "bot") === null)
    assert(Robots.crawlDelay(null, "bot") === null)
    // decimal delays parse (the de-facto format allows them)
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: 0.5\n", "bot") === 0.5)
  }
}
