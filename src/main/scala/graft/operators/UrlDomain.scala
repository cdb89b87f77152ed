package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** URL host + registrable-domain extraction with public-suffix-style
  * rules — the GROUP KEY of web-corpus curation. Per-domain caps, skew
  * reports, and blocklists all need "which site is this from", and the
  * answer is NOT the hostname (every `*.blogspot`-shaped host would be
  * its own group) nor the TLD (half the web collapses into `.com`): it
  * is the registrable domain — one label below the longest matching
  * PUBLIC suffix.
  *
  * Suffix matching implements the public-suffix-list rule grammar
  * (normal / `*.wildcard` / `!exception`, longest-match wins, exception
  * beats wildcard, default rule `*`) over a curated rule resource
  * committed at `graft/psl/rules.txt`; deployments needing the full
  * registry structure point `-Dgraft.psl.resource` / `GRAFT_PSL_RESOURCE`
  * at a complete rules file in the same grammar (the vocab operator's
  * override pattern).
  *
  * Scale shape: rules load ONCE per JVM into plain hash sets (no task
  * closure, no broadcast); per-row work is one bounded label walk (hosts
  * have ≤ ~10 labels) invoked from codegen'd Catalyst expressions
  * ([[graft.plans.UrlExpressions]]) — the langid-profile discipline, so
  * the extraction rides whole-stage codegen over 100 TB of URLs.
  *
  * Deliberate edge semantics (each spec-pinned):
  *  - IPv4 literals, bracketed IPv6, `localhost`/single-label hosts →
  *    null registrable domain (no registry, no group key).
  *  - a host that IS a public suffix (e.g. `co.uk`) → null.
  *  - ports, userinfo, paths, queries, fragments, trailing dots are
  *    stripped by [[hostOf]]; scheme optional.
  */
object UrlDomain {

  /** (normal rules, wildcard parents, exception hosts) — loaded once. */
  lazy val rules: (java.util.HashSet[String], java.util.HashSet[String], java.util.HashSet[String]) = {
    val res = sys.props.get("graft.psl.resource")
      .orElse(sys.env.get("GRAFT_PSL_RESOURCE"))
      .getOrElse("graft/psl/rules.txt")
    val in = Thread.currentThread().getContextClassLoader.getResourceAsStream(res)
    require(in != null, s"public-suffix rules resource not found: $res")
    val normal = new java.util.HashSet[String]()
    val wild = new java.util.HashSet[String]()
    val exc = new java.util.HashSet[String]()
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).foreach {
        case l if l.startsWith("!")  => exc.add(l.substring(1))
        case l if l.startsWith("*.") => wild.add(l.substring(2))
        case l                       => normal.add(l)
      }
    } finally src.close()
    (normal, wild, exc)
  }

  /** Host of a URL: optional scheme (`s://` or protocol-relative `//`),
    * optional userinfo, stops at path/query/fragment/port, lowercased,
    * trailing dot stripped. Bracketed IPv6 returns the bracket contents.
    * Null/empty/hostless input → null. */
  def hostOf(url: String): String = {
    if (url == null) return null
    var s = url.trim
    if (s.isEmpty) return null
    val schemeAt = s.indexOf("://")
    if (schemeAt >= 0) s = s.substring(schemeAt + 3)
    else if (s.startsWith("//")) s = s.substring(2)
    var end = s.length
    var i = 0
    while (i < end) {
      val c = s.charAt(i)
      if (c == '/' || c == '?' || c == '#') { end = i }
      i += 1
    }
    s = s.substring(0, end)
    val at = s.lastIndexOf('@')
    if (at >= 0) s = s.substring(at + 1)
    if (s.startsWith("[")) { // IPv6 literal
      val close = s.indexOf(']')
      return if (close <= 1) null else s.substring(1, close).toLowerCase
    }
    val colon = s.indexOf(':')
    if (colon >= 0) {
      // "host:8080" strips a numeric port; "mailto:x" (no "//", non-digit
      // remainder) is an opaque non-authority URI with no host at all
      val rest = s.substring(colon + 1)
      if (rest.nonEmpty && rest.forall(c => c >= '0' && c <= '9')) s = s.substring(0, colon)
      else return null
    }
    while (s.endsWith(".")) s = s.substring(0, s.length - 1)
    if (s.isEmpty) null else s.toLowerCase
  }

  private def isIpv4(labels: Array[String]): Boolean =
    labels.length == 4 && labels.forall(l =>
      l.nonEmpty && l.length <= 3 && l.forall(c => c >= '0' && c <= '9'))

  /** Registrable domain of a HOST per the public-suffix algorithm:
    * one label below the prevailing public suffix (exception rule wins,
    * else the matching rule with the most labels, else the default rule
    * `*` = the last label). Null when the host has no registrable domain
    * (IP literal, single label, host == suffix, empty label). */
  def registrableDomain(host: String): String = {
    if (host == null || host.isEmpty) return null
    if (host.indexOf(':') >= 0) return null // IPv6
    val labels = host.split("\\.", -1)
    if (labels.exists(_.isEmpty)) return null
    if (labels.length < 2) return null
    if (isIpv4(labels)) return null
    val (normal, wild, exc) = rules
    val n = labels.length
    // suffix starting index (0-based) of the prevailing rule
    var excStart = -1
    var ruleStart = -1
    var i = 0
    var cand = host
    while (i < n) {
      // cand = labels[i..n) joined
      if (excStart < 0 && exc.contains(cand)) excStart = i
      if (ruleStart < 0 && normal.contains(cand)) ruleStart = i
      if (ruleStart < 0 && i + 1 < n && wild.contains(cand.substring(cand.indexOf('.') + 1)))
        ruleStart = i
      if (excStart >= 0) i = n // exception prevails; stop scanning
      else {
        i += 1
        if (i < n) cand = cand.substring(cand.indexOf('.') + 1)
      }
    }
    // exception rule: its own first label is the registrable domain's head,
    // i.e. the public suffix starts one label further right
    val psStart = if (excStart >= 0) excStart + 1
                  else if (ruleStart >= 0) ruleStart
                  else n - 1 // default rule '*'
    if (psStart < 1) null // the whole host is a public suffix
    else labels.slice(psStart - 1, n).mkString(".")
  }

  def domainOfUrl(url: String): String = registrableDomain(hostOf(url))

  // UTF8String wrappers for the codegen'd expressions
  def hostOfUTF8(url: UTF8String): UTF8String = {
    val r = hostOf(url.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  def domainOfUrlUTF8(url: UTF8String): UTF8String = {
    val r = domainOfUrl(url.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Canonical URL form for URL-level exact dedup — the same page is
    * crawled under dozens of spellings, and a canonicalizer is what
    * makes "same URL" a join key:
    *  - scheme and host lowercased; default ports (:80 http, :443
    *    https) stripped; trailing host dot stripped;
    *  - fragment removed (never sent to the server);
    *  - tracking parameters removed (utm_*, fbclid, gclid, msclkid,
    *    ref — the public analytics-tag families);
    *  - remaining query parameters SORTED by (key, value): parameter
    *    order is almost never semantic and unordered-equal URLs should
    *    collide (deviations welcome at a caller that knows better);
    *  - empty path → "/"; empty query dropped.
    * Null/hostless input → null. Pure string function of the input —
    * engine-replayable, oracle-checked. */
  def canonicalizeUrl(url: String): String = {
    if (url == null) return null
    var s = url.trim
    if (s.isEmpty) return null
    val schemeAt = s.indexOf("://")
    val scheme = if (schemeAt >= 0) s.substring(0, schemeAt).toLowerCase
                 else if (s.startsWith("//")) "https" else return null
    val rest = if (schemeAt >= 0) s.substring(schemeAt + 3) else s.substring(2)
    var end = rest.length
    var i = 0
    while (i < end) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') end = i
      i += 1
    }
    var authority = rest.substring(0, end)
    val at = authority.lastIndexOf('@')
    if (at >= 0) authority = authority.substring(at + 1)
    // bracketed-IPv6 branch mirrors hostOf (advisor r16, low: splitting at
    // the first ':' made '[::1]:8080' canonicalize to host '[' — hostOf and
    // canonicalizeUrl must agree on every URL); the canonical form keeps the
    // brackets (a canonical URL must itself be a valid URL)
    var host: String = null
    var port = ""
    if (authority.startsWith("[")) {
      val close = authority.indexOf(']')
      if (close <= 1) return null
      host = authority.substring(0, close + 1).toLowerCase
      val after = authority.substring(close + 1)
      if (after.startsWith(":")) port = after.substring(1)
      else if (after.nonEmpty) return null
    } else {
      val colon = authority.indexOf(':')
      host = (if (colon >= 0) authority.substring(0, colon) else authority).toLowerCase
      while (host.endsWith(".")) host = host.substring(0, host.length - 1)
      port = if (colon >= 0) authority.substring(colon + 1) else ""
    }
    if (host.isEmpty) return null
    // non-numeric "port" = no authority (the hostOf mailto:-class rule);
    // both functions now return null rather than disagreeing
    if (port.nonEmpty && !port.forall(c => c >= '0' && c <= '9')) return null
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    val tail = rest.substring(end)
    val hashAt = tail.indexOf('#')
    val noFrag = if (hashAt >= 0) tail.substring(0, hashAt) else tail
    val qAt = noFrag.indexOf('?')
    val path = if (qAt >= 0) noFrag.substring(0, qAt) else noFrag
    val query = if (qAt >= 0) noFrag.substring(qAt + 1) else ""
    val kept = query.split("&").filter(_.nonEmpty).filterNot { p =>
      val k = p.takeWhile(_ != '=').toLowerCase
      k.startsWith("utm_") || k == "fbclid" || k == "gclid" || k == "msclkid" || k == "ref"
    }.sorted
    val canonPath = if (path.isEmpty) "/" else path
    scheme + "://" + host + (if (keepPort) ":" + port else "") + canonPath +
      (if (kept.nonEmpty) "?" + kept.mkString("&") else "")
  }

  def canonicalizeUrlUTF8(url: UTF8String): UTF8String = {
    val r = canonicalizeUrl(url.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Column builders (codegen'd native expressions, not UDFs). */
  def urlHost(url: Column): Column = graft.plans.UrlExpressions.urlHost(url)
  def urlDomain(url: Column): Column = graft.plans.UrlExpressions.urlDomain(url)
  def urlCanonical(url: Column): Column = graft.plans.UrlExpressions.urlCanonical(url)

  /** Per-registrable-domain curation report over a URL column: row and
    * distinct-host counts plus an exact ppm share — the table a
    * web-corpus run caps and skew-audits against. URLs with no
    * registrable domain (IPs, single labels, bare suffixes) report as
    * the null-domain group rather than vanishing: at curation time
    * "unattributable" is a population, not a discard. One aggregating
    * shuffle on the domain key; the share join is a 1-row broadcast. */
  def domainReport(df: DataFrame, urlCol: String): DataFrame = {
    val base = df.select(urlDomain(col(s"`$urlCol`")).as("domain"),
      urlHost(col(s"`$urlCol`")).as("host"))
    val counts = base.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("host")).as("n_hosts"))
    counts.crossJoin(broadcast(counts.agg(sum(col("n_urls")).as("__total"))))
      .select(col("domain"), col("n_urls"), col("n_hosts"),
        expr("(n_urls * 1000000) div __total").as("share_ppm"))
  }
}
