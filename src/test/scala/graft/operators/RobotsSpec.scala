package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RobotsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("prefix disallow, longest-match precedence, allow-on-tie") {
    val txt = "User-agent: *\nDisallow: /admin\nAllow: /admin/public\n"
    assert(Robots.isAllowed(txt, "bot", "/index"))
    assert(!Robots.isAllowed(txt, "bot", "/admin/settings"))
    assert(Robots.isAllowed(txt, "bot", "/admin/public/page")) // 13 beats 6
    // exact tie: equal-length allow and disallow -> allow wins
    val tie = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    assert(Robots.isAllowed(tie, "bot", "/page/x"))
  }

  test("wildcards and end anchors per RFC 9309 §2.2.2") {
    val txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*\nAllow: /tmp/keep$\n"
    assert(!Robots.isAllowed(txt, "bot", "/docs/report.pdf"))
    assert(Robots.isAllowed(txt, "bot", "/docs/report.pdf.html")) // anchored
    assert(!Robots.isAllowed(txt, "bot", "/tmp/scratch"))
    assert(Robots.isAllowed(txt, "bot", "/tmp/keep")) // 10 beats 5
    // anchored middle-wildcard: greedy-left must not bind the first 'b'
    val g = "User-agent: *\nDisallow: /a*b$\n"
    assert(!Robots.isAllowed(g, "bot", "/axbyb"))
    assert(Robots.isAllowed(g, "bot", "/axbyc"))
  }

  test("group selection: named group beats *, groups merge, agent case-insensitive") {
    val txt = "User-agent: GraftBot\nDisallow: /private\n\n" +
      "User-agent: graftbot\nDisallow: /extra\n\n" +
      "User-agent: *\nDisallow: /\n"
    assert(!Robots.isAllowed(txt, "graftbot", "/private/x"))
    assert(!Robots.isAllowed(txt, "graftbot", "/extra/y")) // groups MERGE
    assert(Robots.isAllowed(txt, "graftbot", "/public")) // star disallow-all ignored
    assert(!Robots.isAllowed(txt, "unknownbot", "/public")) // star applies
  }

  test("consecutive user-agent lines form one group; rules before any group are ignored") {
    val txt = "Disallow: /orphan\n" + // no group yet: ignored
      "User-agent: a\nUser-agent: b\nDisallow: /shared\n"
    assert(Robots.isAllowed(txt, "a", "/orphan/x"))
    assert(!Robots.isAllowed(txt, "a", "/shared/x"))
    assert(!Robots.isAllowed(txt, "b", "/shared/x"))
  }

  test("comments, empty disallow, unknown keys, crlf") {
    val txt = "User-agent: * # everyone\r\nCrawl-delay: 10\r\nDisallow:\r\nDisallow: /x # but not this\r\n"
    assert(Robots.isAllowed(txt, "bot", "/anything"))
    assert(!Robots.isAllowed(txt, "bot", "/x/y"))
  }

  test("null semantics: absent robots -> allowed; absent path -> not allowed") {
    assert(Robots.isAllowed(null, "bot", "/x"))
    assert(!Robots.isAllowed("User-agent: *\nAllow: /", "bot", null))
    assert(Robots.isAllowed("User-agent: *\nDisallow: /x", "bot", "")) // "" treated as "/"
  }

  test("sitemap directives: non-group records, case-insensitive key, comments stripped") {
    val txt = "Sitemap: https://a.example.com/sitemap.xml\n" +
      "User-agent: *\nDisallow: /x\n" +
      "sitemap: https://a.example.com/sitemap-news.xml # daily\n" +
      "Sitemap:\n" // empty value ignored
    assert(Robots.sitemaps(txt) === Seq(
      "https://a.example.com/sitemap.xml", "https://a.example.com/sitemap-news.xml"))
    assert(Robots.sitemaps(null) === Nil)
    assert(Robots.sitemaps("User-agent: *\nDisallow: /") === Nil)
  }

  test("column expression matches the kernel and keeps the null contract") {
    import spark.implicits._
    val txt = "User-agent: *\nDisallow: /admin\nAllow: /admin/public\n"
    val rows = Seq(
      (1L, txt, "/index"), (2L, txt, "/admin/x"), (3L, txt, "/admin/public/y"),
      (4L, null.asInstanceOf[String], "/anything"), (5L, txt, null.asInstanceOf[String]))
    val got = rows.toDF("id", "robots", "path")
      .select(col("id"), Robots.allowed(col("robots"), col("path"), "graftbot").as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true, 4L -> true, 5L -> false))
  }
}
