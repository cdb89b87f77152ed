package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Publication-date extraction — the page-level recency signal a
  * training-data pipeline needs for recency weighting ([[Sampling]]'s
  * recency lane), dated dedup tie-breaks (keep the newest copy), and
  * temporal corpus slicing. Real pages declare their date in several
  * competing places; this is the standard extraction LADDER (the
  * trafilatura/newspaper-class heuristic, reimplemented from the public
  * formats), first rung that yields a VALID date wins:
  *
  *  1. `meta` — `<meta property="article:published_time" content=…>`
  *     (the Open Graph article tag) or `<meta name="date" content=…>`;
  *     scanned over the head window like the other [[HtmlMeta]] kernels;
  *  2. `time` — the first `<time datetime=…>` element (HTML5 §4.5.14),
  *     scanned over a WIDER bounded window ([[BodyWindow]]) because
  *     `<time>` lives in the article body, not the head;
  *  3. `url` — a `/YYYY/MM/DD/` path segment (the blog/news permalink
  *     convention), matched on the URL string;
  *  4. none — null.
  *
  * A rung only wins with a VALID leading `YYYY-MM-DD` (years 1990–2099,
  * real month/day ranges — `2026-13-40` falls through to the next rung);
  * time-of-day suffixes are ignored (the date is the signal, timezone
  * conversion of a date-only value would invent precision).
  *
  * Output is a (src, date) struct — `src` names the winning rung, the
  * audit column corpus reports group by.
  *
  * Scale shape: two bounded in-row scans + a regex-free path walk behind
  * a codegen'd expression ([[graft.plans.PageDateExpr]]) — no UDF, no
  * shuffle, cost O(window) per row at any corpus size. */
object PageDate {

  /** `<time>` scan bound: generous enough to reach past the boilerplate
    * head, bounded so a 10 MB page costs 32 KiB of scan. */
  val BodyWindow = 32768

  /** Leading `YYYY-MM-DD` of `s` if valid; null otherwise. */
  private[operators] def leadingDate(s: String): String = {
    if (s == null) return null
    val t = s.trim
    if (t.length < 10) return null
    def d(i: Int): Boolean = { val c = t.charAt(i); c >= '0' && c <= '9' }
    if (!(d(0) && d(1) && d(2) && d(3) && t.charAt(4) == '-' &&
          d(5) && d(6) && t.charAt(7) == '-' && d(8) && d(9))) return null
    val y = t.substring(0, 4).toInt
    val m = t.substring(5, 7).toInt
    val day = t.substring(8, 10).toInt
    if (y < 1990 || y > 2099 || m < 1 || m > 12 || day < 1 || day > 31) return null
    t.substring(0, 10)
  }

  private def metaDate(html: String): String = {
    val cut = if (html.length > BodyWindow) html.substring(0, BodyWindow) else html
    for ((name, body) <- HtmlMeta.tags(cut) if name == "meta") {
      val a = HtmlMeta.attrs(body)
      val hit = a.get("property").exists(_.equalsIgnoreCase("article:published_time")) ||
        a.get("name").exists(_.equalsIgnoreCase("date"))
      if (hit && a.contains("content")) {
        val v = leadingDate(a("content"))
        if (v != null) return v
      }
    }
    null
  }

  private def timeDate(html: String): String = {
    val cut = if (html.length > BodyWindow) html.substring(0, BodyWindow) else html
    for ((name, body) <- HtmlMeta.tags(cut) if name == "time") {
      val a = HtmlMeta.attrs(body)
      if (a.contains("datetime")) {
        val v = leadingDate(a("datetime"))
        if (v != null) return v
      }
    }
    null
  }

  /** `/YYYY/MM/DD/` (or path-final `/YYYY/MM/DD`) in the URL path,
    * validated like every other rung; query/fragment excluded. */
  private[operators] def urlDate(url: String): String = {
    if (url == null) return null
    var end = url.indexOf('?')
    if (end < 0) end = url.indexOf('#')
    val path = if (end < 0) url else url.substring(0, end)
    var i = 0
    val n = path.length
    def dig(j: Int): Boolean = j < n && path.charAt(j) >= '0' && path.charAt(j) <= '9'
    while (i < n) {
      val slash = path.indexOf('/', i)
      if (slash < 0 || slash + 11 > n) return null
      // /YYYY/MM/DD followed by '/' or end-of-path
      if (dig(slash + 1) && dig(slash + 2) && dig(slash + 3) && dig(slash + 4) &&
          slash + 5 < n && path.charAt(slash + 5) == '/' &&
          dig(slash + 6) && dig(slash + 7) &&
          slash + 8 < n && path.charAt(slash + 8) == '/' &&
          dig(slash + 9) && dig(slash + 10) &&
          (slash + 11 == n || path.charAt(slash + 11) == '/')) {
        val cand = path.substring(slash + 1, slash + 5) + "-" +
          path.substring(slash + 6, slash + 8) + "-" +
          path.substring(slash + 9, slash + 11)
        val v = leadingDate(cand)
        if (v != null) return v
      }
      i = slash + 1
    }
    null
  }

  /** The ladder: (src, date) — src in {"meta", "time", "url"}; both null
    * when no rung fires. */
  def extract(url: String, html: String): (String, String) = {
    if (html != null) {
      val m = metaDate(html)
      if (m != null) return ("meta", m)
      val t = timeDate(html)
      if (t != null) return ("time", t)
    }
    val u = urlDate(url)
    if (u != null) ("url", u) else (null, null)
  }

  /** Static entry point for generated code: a (src, date) row, or null
    * when no rung fires. */
  def extractRow(url: UTF8String, html: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (src, date) = extract(
      if (url == null) null else url.toString,
      if (html == null) null else html.toString)
    if (src == null) null
    else org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(src), UTF8String.fromString(date))
  }

  /** Column API: struct(date_src string, pub_date string). A null
    * url/html coalesces to "" so one absent side cannot null the
    * other's rungs (the expression itself is null-safe). */
  def pageDate(url: Column, html: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.PageDateExpr(
        org.apache.spark.sql.GraftBridge.expression(
          org.apache.spark.sql.functions.coalesce(url,
            org.apache.spark.sql.functions.lit(""))),
        org.apache.spark.sql.GraftBridge.expression(
          org.apache.spark.sql.functions.coalesce(html,
            org.apache.spark.sql.functions.lit("")))))
}
