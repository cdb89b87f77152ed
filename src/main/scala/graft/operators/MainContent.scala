package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Main-content extraction — block-level boilerplate removal, the
  * jusText/Readability class of algorithm (Pomikálek 2011, "Removing
  * boilerplate and duplicate content from web corpora"; the published
  * heuristics behind trafilatura/C4-style curation): tag-stripping keeps
  * nav/footer/sidebar text glued onto the article, which poisons every
  * downstream quality metric, dedup key, and tokenizer; real curation
  * segments the page into BLOCKS and keeps only content-like ones.
  * [[TextAnalysis.stripMarkup]] stays as the cheap whole-page arm; this
  * is the precise arm.
  *
  * Deterministic simplification of the published scoring, documented so
  * the planted oracles can state exact outputs:
  *  - the page is segmented at block-level tags (`p`, `div`, headings,
  *    list/table cells, `article`, `section`, …); script/style/comment
  *    payloads are dropped;
  *  - a block inside a SEMANTIC boilerplate container (`nav`, `footer`,
  *    `header`, `aside`, `form`) is boilerplate — the HTML5 sectioning
  *    elements say so themselves;
  *  - link density: a block whose anchor-text mass exceeds 1/3 of its
  *    non-whitespace mass is boilerplate (the jusText link-density
  *    gate, on an exact integer cross-multiplication);
  *  - length: blocks under 25 collapsed characters are boilerplate
  *    (jusText's length-low gate);
  *  - stopword density: a kept block must contain >= 2 occurrences of
  *    the engine's 7-word stopword set (the same set the Gopher-style
  *    quality rules vote with — full-text blocks have function words,
  *    link lists and copyright lines mostly don't).
  * Good blocks' texts (inline tags stripped, entities decoded exactly as
  * [[TextAnalysis.stripMarkup]] decodes them, whitespace collapsed) are
  * joined with a single newline.
  *
  * Scale shape: a pure in-row kernel invoked from a codegen'd expression
  * ([[graft.plans.MainContentExpression]]) — no UDF ser/de, no shuffle,
  * rides whole-stage codegen over the corpus like langid and the URL
  * kernels. Total: never throws on malformed markup (fuzz law). */
object MainContent {

  /** The engine's shared 7-word stopword set (QualityRules/Gopher). */
  val Stopwords: Set[String] = Set("the", "a", "of", "and", "to", "in", "is")

  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "td", "th", "tr", "table", "article", "section", "main", "blockquote",
    "pre", "dd", "dt", "dl", "body", "html", "br", "hr")

  private val BoilerContainers: Set[String] = Set(
    "nav", "footer", "header", "aside", "form")

  /** One segmented block: collapsed text, anchor-text mass (non-ws chars
    * inside `<a>`), and whether any of it sat inside a semantic
    * boilerplate container. */
  final case class Block(text: String, linkChars: Int, inBoilerplate: Boolean)

  /** stripMarkup's exact entity chain (`&amp;` last — the standard
    * single-pass approximation). */
  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  private def collapse(s: String): String =
    s.replaceAll("\\s+", " ").trim

  /** Segment markup into blocks. Total over arbitrary input: any text
    * without block tags is one block. */
  def blocks(html: String): Seq[Block] = {
    if (html == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val sb = new StringBuilder
    var linkChars = 0
    var sawBoiler = false
    var boilerDepth = 0
    var aDepth = 0
    var i = 0
    val n = html.length
    val lower = html.toLowerCase(java.util.Locale.ROOT)

    def flush(): Unit = {
      val text = collapse(decodeEntities(sb.toString))
      if (text.nonEmpty) out += Block(text, linkChars, sawBoiler)
      sb.setLength(0)
      linkChars = 0
      sawBoiler = false
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') {
        sb.append(c)
        if (aDepth > 0 && !Character.isWhitespace(c)) linkChars += 1
        if (boilerDepth > 0 && !Character.isWhitespace(c)) sawBoiler = true
        i += 1
      } else if (lower.startsWith("<!--", i)) {
        val end = lower.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else {
        // read the tag
        var j = i + 1
        val closing = j < n && html.charAt(j) == '/'
        if (closing) j += 1
        val nameStart = j
        while (j < n && (Character.isLetterOrDigit(html.charAt(j)))) j += 1
        val name = lower.substring(nameStart, j)
        val gt = lower.indexOf('>', j)
        val tagEnd = if (gt < 0) n else gt + 1
        if (!closing && (name == "script" || name == "style")) {
          // skip the raw payload to the matching close tag
          val close = lower.indexOf("</" + name, tagEnd)
          i = if (close < 0) n
              else { val g = lower.indexOf('>', close); if (g < 0) n else g + 1 }
        } else {
          if (name == "a") {
            if (closing) aDepth = math.max(0, aDepth - 1) else aDepth += 1
          }
          if (BlockTags.contains(name) || BoilerContainers.contains(name)) flush()
          if (BoilerContainers.contains(name)) {
            if (closing) boilerDepth = math.max(0, boilerDepth - 1)
            else boilerDepth += 1
          }
          sb.append(' ') // every tag is a word boundary (the stripMarkup rule)
          i = tagEnd
        }
      }
    }
    flush()
    out.toSeq
  }

  /** The documented good-block gate. */
  def isGood(b: Block): Boolean = {
    if (b.inBoilerplate) return false
    if (b.text.length < 25) return false
    val nonWs = { var k = 0; var i = 0
      while (i < b.text.length) { if (!Character.isWhitespace(b.text.charAt(i))) k += 1; i += 1 }
      k }
    if (3L * b.linkChars > nonWs) return false
    var stops = 0
    for (t <- b.text.toLowerCase(java.util.Locale.ROOT).split("\\s+"))
      if (Stopwords.contains(t)) stops += 1
    stops >= 2
  }

  /** Good blocks joined by newline; "" when the page has none; null in →
    * null out. */
  def extract(html: String): String = {
    if (html == null) return null
    blocks(html).filter(isGood).map(_.text).mkString("\n")
  }

  def extractUTF8(html: UTF8String): UTF8String = {
    if (html == null) return null
    UTF8String.fromString(extract(html.toString))
  }

  /** Column form — codegen'd native expression, not a UDF. */
  def mainContent(html: Column): Column =
    graft.plans.MainContentExpression.mainContent(html)
}
