package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap XML source (sitemaps.org protocol, the format `Sitemap:`
  * directives in robots.txt point at) — the crawler's URL-DISCOVERY seed:
  * [[graft.operators.Robots.sitemaps]] lists the documents, this parses
  * them, and together they close the frontier loop (robots → sitemap →
  * URL set → canonicalize → cap). Implemented from the published spec:
  *
  *  - `<urlset>` documents carry `<url>` blocks with a required `<loc>`
  *    and optional `<lastmod>` (W3C datetime, kept as text);
  *  - `<sitemapindex>` documents carry `<sitemap>` blocks whose `<loc>`
  *    is a CHILD SITEMAP URL (the caller fetches and parses those next);
  *  - documents may be gzip-compressed (`.xml.gz` — same magic-byte
  *    dispatch as [[Warc]]); encoding is UTF-8 per the spec, decoded
  *    with U+FFFD replacement so the parser is total;
  *  - published limits: 50,000 URLs and 50 MB uncompressed per document.
  *    Both are enforced as LOUD truncation (the `truncated` flag rides
  *    every emitted row) rather than exceptions — a single oversized
  *    (or adversarial) sitemap must neither kill the task nor buffer
  *    unbounded bytes;
  *  - `<loc>` values are XML-entity-escaped per the spec; the five named
  *    entities and numeric references are decoded.
  *
  * The scanner is a bounded hand-rolled block walk, not an XML library:
  * real-world sitemaps are routinely malformed, and the crash-safety law
  * (parsers never throw on mutated input) covers this parser like every
  * other binary/text parser in the engine.
  *
  * Scale shape: sitemap files arrive one-per-row; [[entriesDF]] flatMaps
  * each through the sequential parser in a narrow mapPartitions — files
  * are the parallelism unit, no shuffle, exactly the [[Warc.recordsDF]]
  * discipline.
  */
object Sitemap {

  /** kind is "url" (urlset entry) or "sitemap" (index child).
    * `changefreq` (always/hourly/daily/weekly/monthly/yearly/never) and
    * `priority` (0.0–1.0, kept as text — the spec's own format) are the
    * recrawl-scheduling fields; null when absent or on index children. */
  final case class Entry(kind: String, loc: String, lastmod: String,
                         changefreq: String, priority: String,
                         truncated: Boolean)

  /** Published per-document limits (sitemaps.org). */
  val MaxUrls = 50000
  val MaxBytes: Long = 50L * 1024 * 1024

  /** Decode the five named XML entities plus numeric character
    * references; unknown/garbled references pass through literally (a
    * total function — never throws). */
  private[sources] def decodeEntities(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 10) { out.append(c); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val rep: String = name match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ if name.startsWith("#x") || name.startsWith("#X") =>
              try {
                val cp = Integer.parseInt(name.substring(2), 16)
                if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else null
              } catch { case _: RuntimeException => null }
            case _ if name.startsWith("#") =>
              try {
                val cp = Integer.parseInt(name.substring(1))
                if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else null
              } catch { case _: RuntimeException => null }
            case _ => null
          }
          if (rep == null) { out.append(c); i += 1 }
          else { out.append(rep); i = semi + 1 }
        }
      }
    }
    out.toString
  }

  /** Inflate a gzip document up to [[MaxBytes]]; (bytes, hitCap). Plain
    * input passes through (truncated to the cap, flagged). */
  private[sources] def inflate(content: Array[Byte]): (Array[Byte], Boolean) = {
    if (content.length >= 2 && (content(0) & 0xff) == 0x1f && (content(1) & 0xff) == 0x8b) {
      try {
        val in = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(content), 65536)
        try {
          val out = new java.io.ByteArrayOutputStream(math.min(content.length * 4, 1 << 20))
          val buf = new Array[Byte](65536)
          var n = in.read(buf)
          while (n > 0 && out.size <= MaxBytes) { out.write(buf, 0, n); n = in.read(buf) }
          (out.toByteArray.take(MaxBytes.toInt), n > 0 || out.size > MaxBytes)
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => (Array.emptyByteArray, false) }
    } else if (content.length > MaxBytes) (content.take(MaxBytes.toInt), true)
    else (content, false)
  }

  /** Next occurrence of tag `<name>` (exact tag, not a prefix — `<url>`
    * must not match `<urlset>`) at or after `from`; -1 when absent. */
  private[sources] def findTag(lower: String, name: String, from: Int): Int = {
    var i = from
    val probe = "<" + name
    while (i >= 0) {
      val at = lower.indexOf(probe, i)
      if (at < 0) return -1
      val after = at + probe.length
      if (after < lower.length) {
        val c = lower.charAt(after)
        if (c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '/') return at
      }
      i = at + 1
    }
    -1
  }

  /** Text content of the first `<name>…</name>` inside [from, to); null
    * when absent or unclosed. */
  private[sources] def innerText(raw: String, lower: String, name: String,
                        from: Int, to: Int): String = {
    val open = findTag(lower, name, from)
    if (open < 0 || open >= to) return null
    val gt = lower.indexOf('>', open)
    if (gt < 0 || gt >= to) return null
    val close = lower.indexOf("</" + name, gt + 1)
    if (close < 0 || close >= to) return null
    decodeEntities(raw.substring(gt + 1, close).trim)
  }

  /** Parse one sitemap document (gz or plain). Returns the entries up to
    * the spec limits; malformed blocks are skipped, a malformed document
    * yields the entries parsed before the malformation (never throws). */
  def parse(content: Array[Byte]): Seq[Entry] = {
    if (content == null || content.length < 4) return Nil
    val (bytes, hitByteCap) = inflate(content)
    if (bytes.isEmpty) return Nil
    val raw = new String(bytes, StandardCharsets.UTF_8) // REPLACE is String's default
    val lower = raw.toLowerCase(java.util.Locale.ROOT)
    val isIndex = findTag(lower, "sitemapindex", 0) >= 0
    val isUrlset = findTag(lower, "urlset", 0) >= 0
    if (!isIndex && !isUrlset) return Nil
    val (blockTag, kind) = if (isIndex) ("sitemap", "sitemap") else ("url", "url")
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pos = 0
    var hitUrlCap = false
    var done = false
    while (!done) {
      val open = findTag(lower, blockTag, pos)
      if (open < 0) done = true
      else {
        val close = lower.indexOf("</" + blockTag, open)
        if (close < 0) done = true // unclosed block: stop (truncation point)
        else {
          if (out.size >= MaxUrls) { hitUrlCap = true; done = true }
          else {
            val loc = innerText(raw, lower, "loc", open, close)
            val lastmod = innerText(raw, lower, "lastmod", open, close)
            val changefreq = innerText(raw, lower, "changefreq", open, close)
            val priority = innerText(raw, lower, "priority", open, close)
            if (loc != null && loc.nonEmpty)
              out += Entry(kind, loc, lastmod, changefreq, priority, truncated = false)
            pos = close + blockTag.length + 2
          }
        }
      }
    }
    val truncated = hitByteCap || hitUrlCap
    if (truncated) out.toSeq.map(_.copy(truncated = true)) else out.toSeq
  }

  /** Flatten a (sitemap_id, content) frame of sitemap documents into
    * entries: (sitemap_id, kind, loc, lastmod, truncated). Narrow
    * mapPartitions — files are the parallelism unit, no shuffle. */
  def entriesDF(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("sitemap_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, c) =>
          parse(c).map(e => (id, e.kind, e.loc, e.lastmod, e.changefreq, e.priority, e.truncated))
        }
      }.toDF("sitemap_id", "kind", "loc", "lastmod", "changefreq", "priority", "truncated")
  }

  /** Serialize a urlset document — test/fixture helper (the inverse the
    * specs and planted oracles round-trip through). */
  def writeUrlset(urls: Seq[(String, String)]): Array[Byte] =
    writeUrlsetFull(urls.map { case (loc, lastmod) => (loc, lastmod, null, null) })

  /** Urlset with the scheduling fields (changefreq, priority). */
  def writeUrlsetFull(urls: Seq[(String, String, String, String)]): Array[Byte] = {
    val sb = new StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    urls.foreach { case (loc, lastmod, changefreq, priority) =>
      sb.append("  <url><loc>").append(escapeXml(loc)).append("</loc>")
      if (lastmod != null) sb.append("<lastmod>").append(lastmod).append("</lastmod>")
      if (changefreq != null) sb.append("<changefreq>").append(changefreq).append("</changefreq>")
      if (priority != null) sb.append("<priority>").append(priority).append("</priority>")
      sb.append("</url>\n")
    }
    sb.append("</urlset>\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Serialize a sitemapindex document. */
  def writeIndex(sitemaps: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    sitemaps.foreach(s =>
      sb.append("  <sitemap><loc>").append(escapeXml(s)).append("</loc></sitemap>\n"))
    sb.append("</sitemapindex>\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Gzip a serialized document (`.xml.gz` variant). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes)
    gz.close()
    out.toByteArray
  }

  private def escapeXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")
}
