package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL-shape spam scoring — the crawl-side quality gate that prices a
  * page before fetching a single body byte. Link-farm and SEO-spam URLs
  * have a recognizable SHAPE (keyword-stuffed hyphenated hosts, deep
  * machine-generated paths, tracking-parameter litter, throwaway TLDs),
  * and at frontier scale the cheapest filter is the one that runs on the
  * URL string alone: [[UrlDomain]] canonicalizes, this scores.
  *
  * Everything is integer arithmetic over `regexp_extract`/`split`/
  * `translate` builtins — one narrow codegen'd projection, no UDF, no
  * shuffle, and every feature is replayable by an oracle engine in the
  * shared Java-regex/RE2 dialect (no lookaround).
  *
  * Features (each also useful standalone as a facet column):
  *   - `n_sub`        subdomain labels beyond registrable domain + TLD
  *   - `n_hyphen`     hyphens in the host (keyword stuffing)
  *   - `digit_pct`    percent of host chars that are digits (generated
  *                    hostnames: `h83726.x99.example.net`)
  *   - `path_depth`   `/`-separated path segments
  *   - `n_params`     query parameters
  *   - `n_tracking`   parameters from the public analytics families
  *                    (`utm_*`, `fbclid`, `gclid`, `msclkid`, `ref` —
  *                    the same list [[UrlDomain.canonicalizeUrl]] strips)
  *   - `spam_score`   fixed-weight integer combination; the weights are
  *                    a documented contract, not a learned model — a
  *                    corpus-tuned model belongs in [[Classifier]]
  *
  * Score: `3*n_hyphen + 2*n_sub + digit_pct/10 + 2*max(path_depth-4, 0)
  * + max(n_params-2, 0) + 4*n_tracking + 5*[len(host)>40] + 6*[throwaway
  * TLD]` with throwaway = `.biz .win .top .loan .click` (documented
  * abuse-heavy TLDs; the list is a closed contract like
  * [[Sentences.abbreviations]]).
  */
object UrlSpam {

  private val hostRe = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
  private val pathRe = "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
  private val queryRe = "\\?([^#]*)"
  private val trackingRe = "(?:^|&)(?:utm_[a-z]+|fbclid|gclid|msclkid|ref)="
  private val throwawayTldRe = "\\.(?:biz|win|top|loan|click)$"

  /** Struct of the feature columns + `spam_score` for a lowercase
    * absolute URL; null host (non-URL input) yields a null struct. */
  def features(url: Column): Column = {
    val host = regexp_extract(url, hostRe, 1)
    val path = regexp_extract(url, pathRe, 1)
    val query = regexp_extract(url, queryRe, 1)
    val nSub = greatest(size(split(host, "\\.")) - 2, lit(0)).cast("long")
    val nHyphen = (length(host) - length(translate(host, "-", ""))).cast("long")
    val digitPct = floor(
      (length(host) - length(regexp_replace(host, "[0-9]", ""))) * 100.0 /
        length(host)).cast("long")
    val pathDepth = when(length(path) === 0, lit(0L))
      .otherwise(size(split(path, "/")) - 1).cast("long")
    val nParams = when(length(query) === 0, lit(0L))
      .otherwise(size(split(query, "&"))).cast("long")
    val nTracking = regexp_count(query, lit(trackingRe)).cast("long")
    val score =
      lit(3L) * nHyphen + lit(2L) * nSub + floor(digitPct / 10).cast("long") +
        lit(2L) * greatest(pathDepth - 4, lit(0L)) +
        greatest(nParams - 2, lit(0L)) + lit(4L) * nTracking +
        when(length(host) > 40, lit(5L)).otherwise(lit(0L)) +
        when(host.rlike(throwawayTldRe), lit(6L)).otherwise(lit(0L))
    when(length(host) > 0, struct(
      host.as("host"), nSub.as("n_sub"), nHyphen.as("n_hyphen"),
      digitPct.as("digit_pct"), pathDepth.as("path_depth"),
      nParams.as("n_params"), nTracking.as("n_tracking"),
      score.as("spam_score")))
  }
}
