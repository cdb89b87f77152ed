package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom 1.0 feed source — the OTHER url-discovery channel next
  * to sitemaps ([[Sitemap]]): sitemaps enumerate a site, feeds announce
  * what is NEW, so a continuous crawl polls feeds for fresh URLs (and
  * their publication times — the recency signal) far more often than it
  * re-walks sitemaps. Implemented from the published formats:
  *
  *  - RSS 2.0 (the RSS Advisory Board spec): `<rss><channel>` carrying
  *    `<item>` blocks with `<link>`, `<title>`, `<pubDate>` (RFC 822
  *    date-time) and `<guid>`;
  *  - Atom 1.0 (RFC 4287): `<feed>` carrying `<entry>` blocks with
  *    `<link href=…>` (the entry link is an ATTRIBUTE, rel absent or
  *    `alternate` — deliberately unlike RSS), `<title>`,
  *    `<published>`/`<updated>` (RFC 3339) and `<id>`;
  *  - gzip documents by magic dispatch, XML entity decoding, and the
  *    same bounded block walk as [[Sitemap]] (real feeds are routinely
  *    malformed — parse stops at the damage, never throws); shared
  *    helpers, shared 50 MB inflate cap;
  *  - neither spec publishes an entry limit, so the engine imposes one
  *    as policy: [[MaxEntries]] per document, enforced as LOUD
  *    truncation (the flag rides every emitted row) like the sitemap
  *    limits — an adversarial feed must not buffer unbounded entries.
  *
  * Publication times are surfaced twice: the raw string (the audit
  * trail) and `published_epoch` seconds parsed from the format the
  * carrying dialect prescribes — RFC 1123 for RSS, RFC 3339 for Atom —
  * null when absent or unparseable (a total function; date garbage is
  * routine in feeds).
  *
  * Scale shape: feed files arrive one-per-row; [[entriesDF]] flatMaps
  * each through the sequential parser in a narrow mapPartitions — files
  * are the parallelism unit, no shuffle, the [[Warc.recordsDF]] /
  * [[Sitemap.entriesDF]] discipline.
  */
object Feed {

  /** kind is "rss" or "atom". `guid` is RSS `<guid>` / Atom `<id>`. */
  final case class Entry(kind: String, link: String, title: String,
                         published: String, publishedEpoch: java.lang.Long,
                         guid: String, truncated: Boolean)

  /** Engine policy (the formats publish no limit): entries per document
    * before loud truncation. */
  val MaxEntries = 10000

  /** RFC 1123 / RFC 822 date-time (RSS `pubDate`) → epoch seconds;
    * null on garbage. */
  private[sources] def parseRfc1123(s: String): java.lang.Long =
    if (s == null || s.isEmpty) null
    else try {
      java.lang.Long.valueOf(java.time.ZonedDateTime
        .parse(s.trim, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
        .toEpochSecond)
    } catch { case _: java.time.format.DateTimeParseException => null }

  /** RFC 3339 (Atom `published`/`updated`) → epoch seconds; null on
    * garbage. */
  private[sources] def parseRfc3339(s: String): java.lang.Long =
    if (s == null || s.isEmpty) null
    else try {
      java.lang.Long.valueOf(java.time.OffsetDateTime
        .parse(s.trim, java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
        .toEpochSecond)
    } catch { case _: java.time.format.DateTimeParseException => null }

  /** First `href` attribute of an Atom `<link>` whose `rel` is absent or
    * `alternate`, inside [from, to); null when none. */
  private def atomLink(raw: String, lower: String, from: Int, to: Int): String = {
    var pos = from
    while (pos >= 0 && pos < to) {
      val open = Sitemap.findTag(lower, "link", pos)
      if (open < 0 || open >= to) return null
      val gt = lower.indexOf('>', open)
      val end = if (gt < 0 || gt >= to) to else gt
      val body = raw.substring(open + "<link".length, end)
      val a = graft.operators.HtmlMeta.attrs(body)
      if (a.get("rel").forall(_.equalsIgnoreCase("alternate")) && a.contains("href")) {
        val v = Sitemap.decodeEntities(a("href").trim)
        return if (v.isEmpty) null else v
      }
      pos = end + 1
    }
    null
  }

  /** Parse one feed document (gz or plain). Malformed blocks are
    * skipped; a malformed document yields the entries parsed before the
    * damage (never throws). */
  def parse(content: Array[Byte]): Seq[Entry] = {
    if (content == null || content.length < 4) return Nil
    val (bytes, hitByteCap) = Sitemap.inflate(content)
    if (bytes.isEmpty) return Nil
    val raw = new String(bytes, StandardCharsets.UTF_8)
    val lower = raw.toLowerCase(java.util.Locale.ROOT)
    val isRss = Sitemap.findTag(lower, "rss", 0) >= 0 &&
      Sitemap.findTag(lower, "channel", 0) >= 0
    val isAtom = !isRss && Sitemap.findTag(lower, "feed", 0) >= 0
    if (!isRss && !isAtom) return Nil
    val (blockTag, kind) = if (isRss) ("item", "rss") else ("entry", "atom")
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pos = 0
    var hitEntryCap = false
    var done = false
    while (!done) {
      val open = Sitemap.findTag(lower, blockTag, pos)
      if (open < 0) done = true
      else {
        val close = lower.indexOf("</" + blockTag, open)
        if (close < 0) done = true // unclosed block: the truncation point
        else {
          if (out.size >= MaxEntries) { hitEntryCap = true; done = true }
          else {
            val title = Sitemap.innerText(raw, lower, "title", open, close)
            val (link, published, epoch, guid) =
              if (isRss) {
                val l = Sitemap.innerText(raw, lower, "link", open, close)
                val d = Sitemap.innerText(raw, lower, "pubdate", open, close)
                (l, d, parseRfc1123(d), Sitemap.innerText(raw, lower, "guid", open, close))
              } else {
                val l = atomLink(raw, lower, open, close)
                val d0 = Sitemap.innerText(raw, lower, "published", open, close)
                val d = if (d0 != null) d0 else Sitemap.innerText(raw, lower, "updated", open, close)
                (l, d, parseRfc3339(d), Sitemap.innerText(raw, lower, "id", open, close))
              }
            if (link != null && link.nonEmpty)
              out += Entry(kind, link, title, published, epoch, guid, truncated = false)
            pos = close + blockTag.length + 2
          }
        }
      }
    }
    val truncated = hitByteCap || hitEntryCap
    if (truncated) out.toSeq.map(_.copy(truncated = true)) else out.toSeq
  }

  /** Flatten a (feed_id, content) frame of feed documents into entries.
    * Narrow mapPartitions — files are the parallelism unit, no
    * shuffle. */
  def entriesDF(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("feed_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, c) =>
          parse(c).map(e => (id, e.kind, e.link, e.title, e.published,
            Option(e.publishedEpoch).map(_.longValue()), e.guid, e.truncated))
        }
      }.toDF("feed_id", "kind", "link", "title", "published",
        "published_epoch", "guid", "truncated")
  }

  /** Serialize an RSS 2.0 channel — test/fixture helper (the inverse the
    * specs and planted oracles round-trip through). Null fields are
    * omitted. */
  def writeRss(items: Seq[(String, String, String, String)]): Array[Byte] = {
    val sb = new StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<rss version=\"2.0\"><channel><title>feed</title>\n")
    items.foreach { case (link, title, pubDate, guid) =>
      sb.append("  <item>")
      if (title != null) sb.append("<title>").append(escape(title)).append("</title>")
      sb.append("<link>").append(escape(link)).append("</link>")
      if (pubDate != null) sb.append("<pubDate>").append(pubDate).append("</pubDate>")
      if (guid != null) sb.append("<guid>").append(escape(guid)).append("</guid>")
      sb.append("</item>\n")
    }
    sb.append("</channel></rss>\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Serialize an Atom 1.0 feed. */
  def writeAtom(entries: Seq[(String, String, String, String)]): Array[Byte] = {
    val sb = new StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<feed xmlns=\"http://www.w3.org/2005/Atom\"><title>feed</title>\n")
    entries.foreach { case (link, title, published, id) =>
      sb.append("  <entry>")
      if (title != null) sb.append("<title>").append(escape(title)).append("</title>")
      sb.append("<link rel=\"alternate\" href=\"").append(escape(link)).append("\"/>")
      if (published != null) sb.append("<published>").append(published).append("</published>")
      if (id != null) sb.append("<id>").append(escape(id)).append("</id>")
      sb.append("</entry>\n")
    }
    sb.append("</feed>\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
}
