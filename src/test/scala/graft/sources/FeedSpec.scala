package graft.sources

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

class FeedSpec extends AnyFunSuite {

  test("rss round-trip: link, title, pubDate epoch, guid") {
    val bytes = Feed.writeRss(Seq(
      ("https://example.com/a", "Article A", "Mon, 15 Jun 2026 10:30:00 GMT", "guid-a"),
      ("https://example.com/b", "B & C <d>", "Tue, 16 Jun 2026 08:00:00 +0200", "guid-b")))
    val es = Feed.parse(bytes)
    assert(es.map(_.kind).distinct === Seq("rss"))
    assert(es.map(_.link) === Seq("https://example.com/a", "https://example.com/b"))
    assert(es.map(_.title) === Seq("Article A", "B & C <d>"))
    assert(es(0).publishedEpoch === 1781519400L) // 2026-06-15T10:30:00Z (Mon)
    assert(es(1).publishedEpoch === 1781589600L) 
    assert(es.map(_.guid) === Seq("guid-a", "guid-b"))
    assert(es.forall(!_.truncated))
  }

  test("atom round-trip: href link attribute, published epoch, id") {
    val bytes = Feed.writeAtom(Seq(
      ("https://example.org/x", "X", "2026-06-15T10:30:00Z", "urn:x"),
      ("https://example.org/y?a=1&b=2", "Y", "2026-06-15T12:00:00+02:00", "urn:y")))
    val es = Feed.parse(bytes)
    assert(es.map(_.kind).distinct === Seq("atom"))
    assert(es.map(_.link) === Seq("https://example.org/x", "https://example.org/y?a=1&b=2"))
    assert(es(0).publishedEpoch === 1781519400L)
    assert(es(1).publishedEpoch === 1781517600L) 
    assert(es.map(_.guid) === Seq("urn:x", "urn:y"))
  }

  test("atom: rel=self links are skipped, updated is the published fallback") {
    val xml =
      """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
        |<entry><title>t</title>
        |<link rel="self" href="https://example.org/feed.xml"/>
        |<link href="https://example.org/post"/>
        |<updated>2026-01-02T00:00:00Z</updated>
        |<id>urn:p</id></entry>
        |</feed>""".stripMargin.getBytes(StandardCharsets.UTF_8)
    val es = Feed.parse(xml)
    assert(es.size === 1)
    assert(es.head.link === "https://example.org/post")
    assert(es.head.published === "2026-01-02T00:00:00Z")
    assert(es.head.publishedEpoch === 1767312000L)
  }

  test("garbage dates yield null epoch, entries survive") {
    val bytes = Feed.writeRss(Seq(("https://e.com/a", "t", "yesterday-ish", null)))
    val es = Feed.parse(bytes)
    assert(es.size === 1)
    assert(es.head.published === "yesterday-ish")
    assert(es.head.publishedEpoch === null)
  }

  test("gzip dispatch and entity decoding") {
    val raw = Feed.writeRss(Seq(("https://e.com/?a=1&amp;b=2", "A &amp; B", null, null)))
    // writeRss escapes & itself; build an already-escaped doc manually
    val xml = new String(raw, StandardCharsets.UTF_8)
      .replace("a=1&amp;amp;b=2", "a=1&amp;b=2").replace("A &amp;amp; B", "A &amp; B")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(xml.getBytes(StandardCharsets.UTF_8)); gz.close()
    val es = Feed.parse(bos.toByteArray)
    assert(es.size === 1)
    assert(es.head.link === "https://e.com/?a=1&b=2")
    assert(es.head.title === "A & B")
  }

  test("entry cap truncates loudly") {
    val many = (1 to Feed.MaxEntries + 5).map(i => (s"https://e.com/$i", null: String, null: String, null: String))
    val es = Feed.parse(Feed.writeRss(many))
    assert(es.size === Feed.MaxEntries)
    assert(es.forall(_.truncated))
  }

  test("malformed documents never throw; prefix entries survive") {
    val good = new String(Feed.writeRss(Seq(
      ("https://e.com/1", "a", null, null), ("https://e.com/2", "b", null, null))), StandardCharsets.UTF_8)
    val cut = good.substring(0, good.indexOf("<item>", good.indexOf("<item>") + 1) + 9)
    val es = Feed.parse(cut.getBytes(StandardCharsets.UTF_8))
    assert(es.map(_.link) === Seq("https://e.com/1"))
    // pure garbage
    assert(Feed.parse("not xml at all".getBytes(StandardCharsets.UTF_8)) === Nil)
    assert(Feed.parse(null) === Nil)
    assert(Feed.parse(Array[Byte](0x1f.toByte, 0x8b.toByte, 0, 0)) === Nil)
  }

  test("fuzz: random mutations of a valid feed never throw") {
    val base = Feed.writeRss((1 to 20).map(i =>
      (s"https://e.com/$i", s"title $i", "Mon, 15 Jun 2026 10:30:00 GMT", s"g$i")))
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val b = base.clone()
      (1 to 5).foreach { _ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
      Feed.parse(b) // must not throw
    }
  }

  test("entriesDF flattens files with files as the parallelism unit") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val rss = Feed.writeRss(Seq(("https://e.com/a", "A", "Mon, 15 Jun 2026 10:30:00 GMT", null)))
    val atom = Feed.writeAtom(Seq(("https://e.org/x", "X", "2026-06-15T10:30:00Z", "urn:x")))
    val df = Seq((1L, rss), (2L, atom)).toDF("feed_id", "content")
    val rows = Feed.entriesDF(df).orderBy("feed_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getString(1) === "rss")
    assert(rows(1).getString(1) === "atom")
    assert(rows(0).getLong(5) === 1781519400L)
    assert(rows(1).getLong(5) === 1781519400L)
  }
}
