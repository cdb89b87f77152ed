package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** HTML head-metadata extraction — title, meta description, canonical
  * link: the document-metadata columns every curated web corpus carries
  * next to the body (titles feed dedup keys and quality signals, the
  * canonical link is the SITE's own dedup hint and beats any heuristic
  * canonicalizer when present, descriptions feed retrieval).
  *
  * A bounded head-window scan (first 16 KiB or up to `</head>`), not an
  * HTML parser: tags are located, their attributes parsed generically
  * (quoted/unquoted, any order, any case), values entity-decoded with
  * the [[MainContent]]/stripMarkup chain. Rules:
  *  - `title`: inner text of the first `<title>` element;
  *  - `description`: `<meta name=description content=…>`, falling back
  *    to `<meta property=og:description …>`;
  *  - `canonical`: `<link rel=canonical href=…>` (rel is a
  *    space-separated token list per the spec).
  * Missing element → null. Total on malformed markup (fuzz law).
  *
  * Scale shape: pure bounded in-row kernels behind codegen'd expressions
  * ([[graft.plans.HtmlMetaExpressions]]) — no UDF, no shuffle. */
object HtmlMeta {

  private val HeadWindow = 16384

  private def window(html: String): String = {
    if (html == null) return null
    val cut = if (html.length > HeadWindow) html.substring(0, HeadWindow) else html
    // comments drop up front: a commented-out <title> is not a title
    val w = cut.replaceAll("(?s)<!--.*?-->", " ")
    val lower = w.toLowerCase(java.util.Locale.ROOT)
    val end = lower.indexOf("</head")
    if (end >= 0) w.substring(0, end) else w
  }

  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  private def clean(s: String): String = {
    val t = decodeEntities(s).replaceAll("\\s+", " ").trim
    if (t.isEmpty) null else t
  }

  /** Attributes of the tag whose body is `tag` (the text between `<name`
    * and `>`): lowercase keys, unquoted/single/double values. */
  private[graft] def attrs(tag: String): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    val n = tag.length
    while (i < n) {
      // skip whitespace and stray slashes
      while (i < n && (Character.isWhitespace(tag.charAt(i)) || tag.charAt(i) == '/')) i += 1
      val ks = i
      while (i < n && tag.charAt(i) != '=' && tag.charAt(i) != '>' &&
             !Character.isWhitespace(tag.charAt(i))) i += 1
      val key = tag.substring(ks, i).toLowerCase(java.util.Locale.ROOT)
      while (i < n && Character.isWhitespace(tag.charAt(i))) i += 1
      if (i < n && tag.charAt(i) == '=') {
        i += 1
        while (i < n && Character.isWhitespace(tag.charAt(i))) i += 1
        if (i < n && (tag.charAt(i) == '"' || tag.charAt(i) == '\'')) {
          val q = tag.charAt(i)
          i += 1
          val vs = i
          while (i < n && tag.charAt(i) != q) i += 1
          if (key.nonEmpty) out(key) = tag.substring(vs, math.min(i, n))
          i += 1
        } else {
          val vs = i
          while (i < n && !Character.isWhitespace(tag.charAt(i))) i += 1
          if (key.nonEmpty) out(key) = tag.substring(vs, i)
        }
      } else if (key.nonEmpty) out(key) = ""
    }
    out.toMap
  }

  /** Every (tagName, attrBody) in the head window, in order. */
  private[operators] def tags(w: String): Iterator[(String, String)] = new Iterator[(String, String)] {
    private val lower = w.toLowerCase(java.util.Locale.ROOT)
    private var pos = 0
    private var nextTag: (String, String) = null
    private def advance(): Unit = {
      nextTag = null
      while (nextTag == null && pos < w.length) {
        val lt = w.indexOf('<', pos)
        if (lt < 0) { pos = w.length; return }
        if (lower.startsWith("<!--", lt)) {
          val end = lower.indexOf("-->", lt + 4)
          pos = if (end < 0) w.length else end + 3
        } else {
          var j = lt + 1
          if (j < w.length && w.charAt(j) == '/') j += 1
          val ns = j
          while (j < w.length && Character.isLetterOrDigit(w.charAt(j))) j += 1
          val name = lower.substring(ns, j)
          val gt = w.indexOf('>', j)
          val end = if (gt < 0) w.length else gt
          if (name.nonEmpty && ns == lt + 1) // opening tags only
            nextTag = (name, w.substring(j, end))
          pos = end + 1
        }
      }
    }
    advance()
    override def hasNext: Boolean = nextTag != null
    override def next(): (String, String) = { val t = nextTag; advance(); t }
  }

  def title(html: String): String = {
    val w = window(html)
    if (w == null) return null
    val lower = w.toLowerCase(java.util.Locale.ROOT)
    val open = lower.indexOf("<title")
    if (open < 0) return null
    val gt = w.indexOf('>', open)
    if (gt < 0) return null
    val close = lower.indexOf("</title", gt + 1)
    if (close < 0) return null
    clean(w.substring(gt + 1, close))
  }

  def description(html: String): String = {
    val w = window(html)
    if (w == null) return null
    var og: String = null
    for ((name, body) <- tags(w) if name == "meta") {
      val a = attrs(body)
      val content = a.get("content")
      if (content.isDefined) {
        if (a.get("name").exists(_.equalsIgnoreCase("description"))) {
          // a whitespace-only description cleans to null — keep scanning
          // so a later og:description can still apply (advisor r17)
          val c = clean(content.get)
          if (c != null) return c
        }
        if (og == null && a.get("property").exists(_.equalsIgnoreCase("og:description")))
          og = content.get
      }
    }
    if (og == null) null else clean(og)
  }

  def canonical(html: String): String = {
    val w = window(html)
    if (w == null) return null
    for ((name, body) <- tags(w) if name == "link") {
      val a = attrs(body)
      val isCanonical = a.get("rel").exists(
        _.toLowerCase(java.util.Locale.ROOT).split("\\s+").contains("canonical"))
      if (isCanonical && a.contains("href")) {
        val v = a("href").trim
        return if (v.isEmpty) null else decodeEntities(v)
      }
    }
    null
  }

  /** Feed autodiscovery (the RSS/Atom convention every browser and
    * crawler implements): hrefs of head `<link>` tags whose `rel` token
    * list contains `alternate` AND whose `type` is
    * `application/rss+xml` or `application/atom+xml`, in document
    * order. This is how feeds are actually FOUND — pages advertise
    * them; [[graft.sources.Feed]] then parses what this discovers.
    * Empty array when none (null only on null input). */
  def feedLinks(html: String): Seq[String] = {
    val w = window(html)
    if (w == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, body) <- tags(w) if name == "link") {
      val a = attrs(body)
      val isAlt = a.get("rel").exists(
        _.toLowerCase(java.util.Locale.ROOT).split("\\s+").contains("alternate"))
      val isFeed = a.get("type").exists { t =>
        val tt = t.trim.toLowerCase(java.util.Locale.ROOT)
        tt == "application/rss+xml" || tt == "application/atom+xml"
      }
      if (isAlt && isFeed && a.contains("href")) {
        val v = a("href").trim
        if (v.nonEmpty) out += decodeEntities(v)
      }
    }
    out.toSeq
  }

  /** Raw content of the first `<meta name=robots content=…>` — the
    * page's OWN indexing directives (noindex/nofollow token list, RFC
    * 9309's html-level sibling). The kernel returns the content string;
    * token tests stay in the query so the contract is replayable with
    * plain string builtins. Null when absent. */
  def robotsContent(html: String): String = {
    val w = window(html)
    if (w == null) return null
    for ((name, body) <- tags(w) if name == "meta") {
      val a = attrs(body)
      if (a.get("name").exists(_.equalsIgnoreCase("robots")) && a.contains("content")) {
        val c = clean(a("content"))
        if (c != null) return c
      }
    }
    null
  }

  def titleUTF8(html: UTF8String): UTF8String =
    if (html == null) null else {
      val r = title(html.toString); if (r == null) null else UTF8String.fromString(r)
    }
  def descriptionUTF8(html: UTF8String): UTF8String =
    if (html == null) null else {
      val r = description(html.toString); if (r == null) null else UTF8String.fromString(r)
    }
  def canonicalUTF8(html: UTF8String): UTF8String =
    if (html == null) null else {
      val r = canonical(html.toString); if (r == null) null else UTF8String.fromString(r)
    }
  def robotsContentUTF8(html: UTF8String): UTF8String =
    if (html == null) null else {
      val r = robotsContent(html.toString); if (r == null) null else UTF8String.fromString(r)
    }
  def feedLinksArray(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    if (html == null) null else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      feedLinks(html.toString).map(UTF8String.fromString).toArray[Any])

  /** Column forms — codegen'd native expressions. */
  def htmlTitle(html: Column): Column = graft.plans.HtmlMetaExpressions.htmlTitle(html)
  def htmlDescription(html: Column): Column = graft.plans.HtmlMetaExpressions.htmlDescription(html)
  def htmlCanonical(html: Column): Column = graft.plans.HtmlMetaExpressions.htmlCanonical(html)
  def htmlRobots(html: Column): Column = graft.plans.HtmlMetaExpressions.htmlRobots(html)
  def htmlFeedLinks(html: Column): Column = graft.plans.HtmlMetaExpressions.htmlFeedLinks(html)
}
