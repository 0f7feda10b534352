package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization + registered-domain extraction — the first stage
 * of every web-scale curation pipeline (RefinedWeb/CCNet shape): raw
 * crawl URLs vary in case, default ports, `www.`, tracking params,
 * trailing slashes and fragments, and the SAME page must collapse to ONE
 * canonical key before url-level dedup, domain-level mixing caps
 * (q143's consumers) and blocklist filtering can work.
 *
 * Rules (the portable, widely-published subset):
 *   scheme/host lowercased; `www.` stripped; default port (`:443` https,
 *   `:80` http) stripped, explicit non-default ports kept; path trailing
 *   slashes trimmed (empty path → `/`); query params filtered of
 *   `utm_*`/`gclid` trackers then SORTED and rejoined; fragment dropped.
 * Registered domain = last two dot-labels of the port-less host (a fixed
 * public-suffix list plugs in here at production; the two-label rule is
 * the oracle-replayable core).
 *
 * Everything is native column expressions (regexp + array ops — one
 * interpreted higher-order filter over a tiny param array); no UDF, no
 * shuffle: canonicalization is a map-only pass no matter the corpus size.
 */
object UrlOps {

  private val UrlRe = "^([A-Za-z]+)://([^/?#]+)([^?#]*)\\??([^#]*)"

  private def scheme(url: Column) = lower(regexp_extract(url, UrlRe, 1))
  private def rawHost(url: Column) = lower(regexp_extract(url, UrlRe, 2))

  /** Lowercased host(:port) with `www.` and the scheme-default port
    * stripped. */
  def canonicalHost(url: Column): Column = {
    val h = regexp_replace(rawHost(url), "^www\\.", "")
    when(scheme(url) === "https", regexp_replace(h, ":443$", ""))
      .when(scheme(url) === "http", regexp_replace(h, ":80$", ""))
      .otherwise(h)
  }

  /** Path with trailing slashes trimmed; empty → "/". */
  private def canonicalPath(url: Column): Column = {
    val p = regexp_replace(regexp_extract(url, UrlRe, 3), "/+$", "")
    when(p === "", "/").otherwise(p)
  }

  /** Query with tracking params dropped and the rest sorted; "" if none. */
  private def canonicalQuery(url: Column): Column = {
    val kept = filter(split(regexp_extract(url, UrlRe, 4), "&"),
      p => !startswith(p, lit("utm_")) && !startswith(p, lit("gclid=")))
    array_join(array_sort(kept), "&")
  }

  /** The canonical form — equal strings ⇔ same page under the rules. */
  def canonicalUrl(url: Column): Column = {
    val q = canonicalQuery(url)
    concat(scheme(url), lit("://"), canonicalHost(url), canonicalPath(url),
      when(q === "", "").otherwise(concat(lit("?"), q)))
  }

  /** Last two labels of the port-less canonical host. */
  def registeredDomain(url: Column): Column =
    regexp_extract(regexp_replace(canonicalHost(url), ":[0-9]+$", ""),
      "([^.]+\\.[^.]+)$", 1)
}
