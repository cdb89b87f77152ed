package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) — the
  * OTHER day-one gate of web-corpus curation beside the registrable
  * domain ([[UrlDomain]]): a crawl-derived training corpus is expected
  * to honor per-site exclusion rules, and re-checking them at curation
  * time ("was this fetch allowed?") is a standard compliance pass.
  *
  * Implemented from the published RFC:
  *  - line grammar: `key: value`, case-insensitive keys (`user-agent`,
  *    `allow`, `disallow`; unknown keys ignored), `#` comments, groups =
  *    runs of user-agent lines followed by their rules (a rule line
  *    before any user-agent line belongs to no group and is ignored);
  *  - group selection: all groups whose user-agent token matches the
  *    crawler's product token case-insensitively, else the `*` groups;
  *    matching groups MERGE (RFC 9309 §2.2.1);
  *  - rule matching: `*` matches any octet sequence, `$` anchors the
  *    pattern end; the rule with the LONGEST pattern wins; on a
  *    length tie `allow` wins; no matching rule → allowed (§2.2.2);
  *  - an empty `disallow:` value disallows nothing.
  *
  * Deliberate simplifications, documented: product-token matching is
  * exact (case-insensitive), not substring; percent-encoding is
  * compared literally (callers normalize upstream if they mix encodings).
  *
  * Scale shape: one robots.txt serves MANY rows (a corpus keyed by
  * domain repeats each file thousands of times), so parsed rule lists
  * are memoized per (robots bytes, agent) in a bounded per-JVM map —
  * per-row work is the rule walk only, invoked from a codegen'd
  * expression ([[graft.plans.RobotsExpression]]), no UDF, no closure
  * state. */
object Robots {

  /** Compiled rule: allow?, pattern split at '*' into literal segments,
    * end-anchored?, pattern length (the specificity key). */
  private[operators] final case class Rule(allow: Boolean, segments: Array[String],
                                           anchored: Boolean, length: Int)

  /** Parse robots.txt and keep only the rules governing `agent`
    * (matching groups merged; `*` groups used when no named group
    * matches). Rules sorted by (length desc, allow-first) so the first
    * match IS the verdict. */
  private[operators] def rulesFor(txt: String, agent: String): Array[Rule] = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val named = scala.collection.mutable.ArrayBuffer.empty[Rule]
    val starred = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var groupAgents: List[String] = Nil
    var inAgentRun = false // consecutive user-agent lines accumulate ONE group
    for (raw <- txt.split("\n", -1)) {
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inAgentRun) groupAgents ::= value.toLowerCase(java.util.Locale.ROOT)
            else { groupAgents = List(value.toLowerCase(java.util.Locale.ROOT)); inAgentRun = true }
          case "allow" | "disallow" =>
            inAgentRun = false
            // an empty value ("disallow:" = disallow nothing) is a no-op
            if (value.nonEmpty && groupAgents.nonEmpty) {
              val anchored = value.endsWith("$")
              val pat = if (anchored) value.substring(0, value.length - 1) else value
              val rule = Rule(key == "allow", pat.split("\\*", -1), anchored, value.length)
              if (groupAgents.contains(agentLc)) named += rule
              else if (groupAgents.contains("*")) starred += rule
            }
          case _ => inAgentRun = false
        }
      }
    }
    val chosen = if (named.nonEmpty) named else starred
    chosen.sortBy(r => (-r.length, !r.allow)).toArray
  }

  /** `*`-wildcard, optionally `$`-anchored pattern match over a path.
    * Middle segments scan greedy-left (correct for existence); the LAST
    * segment anchors at the path end when `$` is present — a greedy-left
    * scan there would miss "/a*b$" on "/axbyb" by binding the first b. */
  private[operators] def patternMatches(r: Rule, path: String): Boolean = {
    val segs = r.segments
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    if (segs.length == 1) return !r.anchored || pos == path.length
    var i = 1
    while (i < segs.length - 1) {
      val s = segs(i)
      if (s.nonEmpty) {
        val at = path.indexOf(s, pos)
        if (at < 0) return false
        pos = at + s.length
      }
      i += 1
    }
    val last = segs(segs.length - 1)
    if (last.isEmpty) true // trailing '*': matches any tail, anchored or not
    else if (r.anchored) path.length - last.length >= pos && path.endsWith(last)
    else path.indexOf(last, pos) >= 0
  }

  // (robots-text, agent) -> compiled rules; robots files repeat across a
  // corpus keyed by site, so this is a high-hit-rate bounded cache. Keys
  // are the SHA-256 of (agent, text), NOT the text itself (advisor r16,
  // low: RFC 9309 expects files up to 500 KiB, so 4096 text-keyed entries
  // could pin ~2 GB per executor forever), and the cache is bounded by
  // BYTES of retained compiled patterns as well as by entry count — past
  // either bound new inputs recompute (the alphaCache discipline), they
  // never grow the heap.
  private val cache = new ConcurrentHashMap[String, Array[Rule]]()
  private val cacheCap = 4096
  private val cacheByteCap = 64L << 20
  private val cacheBytes = new java.util.concurrent.atomic.AtomicLong()
  private val sha = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("SHA-256"))

  private def ruleSetBytes(rules: Array[Rule]): Long =
    rules.foldLeft(64L)((acc, r) =>
      acc + 48L + r.segments.foldLeft(0L)((a, s) => a + 40L + s.length * 2L))

  private def cachedRules(txt: String, agent: String): Array[Rule] = {
    val md = sha.get()
    md.reset()
    md.update(agent.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(0.toByte)
    md.update(txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val key = java.util.Base64.getEncoder.encodeToString(md.digest())
    val hit = cache.get(key)
    if (hit != null) return hit
    val rules = rulesFor(txt, agent)
    val sz = ruleSetBytes(rules)
    // reserve bytes BEFORE the insert and roll back on failure: the old
    // check-then-act (get() + sz <= cap, then insert) let N concurrent
    // inserts all pass the check and collectively overshoot the byte cap
    // (advisor r17). With reservation the bound holds under concurrency.
    if (cache.size < cacheCap) {
      val reserved = cacheBytes.addAndGet(sz)
      if (reserved > cacheByteCap || cache.putIfAbsent(key, rules) != null)
        cacheBytes.addAndGet(-sz)
    }
    rules
  }

  /** Is fetching `path` allowed for `agent` under `robotsTxt`?
    * Null robots text (site has none) → allowed; null path → false. */
  def isAllowed(robotsTxt: String, agent: String, path: String): Boolean = {
    if (path == null) return false
    if (robotsTxt == null) return true
    val p = if (path.isEmpty) "/" else path
    val rules = cachedRules(robotsTxt, agent)
    var i = 0
    while (i < rules.length) { // sorted: first match is the verdict
      if (patternMatches(rules(i), p)) return rules(i).allow
      i += 1
    }
    true
  }

  /** `Sitemap:` directives (RFC 9309 allows non-group records; sitemap
    * lines are the URL-discovery seed a crawler reads next) — order
    * preserved, duplicates kept (the caller's fetch planner dedups). */
  def sitemaps(robotsTxt: String): Seq[String] = {
    if (robotsTxt == null) return Nil
    robotsTxt.split("\n", -1).toSeq.flatMap { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
        line.substring(0, colon).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }
  }

  /** De-facto `Crawl-delay:` directive (not part of RFC 9309 but honored
    * by most major crawlers — the politeness knob a frontier scheduler
    * reads): seconds between fetches for the agent's matching groups.
    * Group scoping follows the allow/disallow rules (named groups beat
    * `*`; when several matching groups declare delays the most
    * CONSERVATIVE — largest — wins). Null when absent or unparsable;
    * negative values ignored. */
  def crawlDelay(robotsTxt: String, agent: String): java.lang.Double = {
    if (robotsTxt == null) return null
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    var named: java.lang.Double = null
    var starred: java.lang.Double = null
    var groupAgents: List[String] = Nil
    var inAgentRun = false
    for (raw <- robotsTxt.split("\n", -1)) {
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inAgentRun) groupAgents ::= value.toLowerCase(java.util.Locale.ROOT)
            else { groupAgents = List(value.toLowerCase(java.util.Locale.ROOT)); inAgentRun = true }
          case "crawl-delay" =>
            inAgentRun = false
            val v = try java.lang.Double.parseDouble(value)
                    catch { case _: NumberFormatException => Double.NaN }
            if (!v.isNaN && v >= 0 && groupAgents.nonEmpty) {
              if (groupAgents.contains(agentLc)) {
                if (named == null || v > named.doubleValue()) named = v
              } else if (groupAgents.contains("*")) {
                if (starred == null || v > starred.doubleValue()) starred = v
              }
            }
          case _ => inAgentRun = false
        }
      }
    }
    if (named != null) named else starred
  }

  def isAllowedUTF8(robotsTxt: UTF8String, agent: String, path: UTF8String): Boolean =
    isAllowed(if (robotsTxt == null) null else robotsTxt.toString, agent,
      if (path == null) null else path.toString)

  /** Column form: codegen'd expression, agent pinned at plan time (a
    * pipeline crawls as ONE product token). */
  def allowed(robotsTxt: Column, path: Column, agent: String): Column =
    graft.plans.RobotsExpression.allowed(robotsTxt, path, agent)
}
