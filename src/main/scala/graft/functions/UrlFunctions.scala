package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-scale dedup: the same page is
  * typically crawled under many spellings (host case, default ports,
  * fragments, tracking params), and exact-url dedup without
  * canonicalization silently keeps them all. One codegen'd
  * regexp-chain expression — scan speed, no UDF — with explicit ASCII
  * classes so Java regex (Spark) and RE2-family engines agree
  * byte-for-byte (the DuckDB oracle replicates the same chain).
  *
  * Canonical form:
  *  - scheme and host lower-cased (path/query case is preserved —
  *    paths are case-sensitive on most origins)
  *  - default ports stripped (`:80` for http, `:443` for https)
  *  - fragment dropped
  *  - tracking params removed (`utm_*`, `fbclid`, `gclid`), with
  *    separator repair and trailing `?`/`&` cleanup; remaining param
  *    ORDER is preserved (re-ordering changes semantics on some apps)
  *  - a bare `/` path collapses to the empty path
  *  - non-URL strings (no `scheme://`) fall back to lower(trim())
  */
object UrlFunctions {

  def normalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val noFrag = regexp_replace(rest, "#.*$", "")
    // tracking-param strip + separator repair operate on the QUERY
    // STRING only: '&' is a legal raw path character, and a path like
    // /x&utm_campaign=raw/y must survive untouched
    val pathPart = regexp_extract(noFrag, "^([^?]*)", 1)
    val queryPart = regexp_extract(noFrag, "(\\?.*)$", 1)
    val noTrack = regexp_replace(queryPart, "([?&])(utm_[^=&]*|fbclid|gclid)=[^&]*", "$1")
    val fixSep = regexp_replace(regexp_replace(noTrack, "\\?&+", "?"), "&&+", "&")
    val cleanQ = regexp_replace(fixSep, "[?&]+$", "")
    val clean = concat(pathPart, cleanQ)
    val path = when(clean === "/", lit("")).otherwise(clean)
    when(scheme === "", lower(u))
      .otherwise(concat(scheme, lit("://"), host, path))
  }

  /** Lowercased host of a URL, port stripped — the key for
    * domain-level policy (blocklists, per-host caps). */
  def urlHost(url: Column): Column =
    split(lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)), ":")
      .getItem(0)

  /** Domain-suffix blocklist check (the Dolma/C4-style URL filter):
    * a host is blocked iff the host ITSELF or any parent domain
    * (label-boundary suffix) appears in `blocked` — so
    * "tracker.example.com" blocks "ads.tracker.example.com" but
    * never "nottracker.example.com" (substring matching's classic
    * false positive).
    *
    * Scale shape: the blocklist is a plan LITERAL array (real lists
    * are 10^4–10^6 entries — past literal size, swap the
    * `arrays_overlap` for a broadcast-join on the exploded suffix,
    * same semantics); suffix generation is O(labels) in-row HOFs —
    * pure scan, no shuffle, no UDF.
    */
  def domainBlocked(url: Column, blocked: Seq[String]): Column = {
    require(blocked.nonEmpty, "empty blocklist — nothing to check")
    val host = urlHost(url)
    val labels = split(host, "\\.")
    val suffixes = transform(labels,
      (_, i) => array_join(slice(labels, i + 1, size(labels)), "."))
    arrays_overlap(suffixes, array(blocked.map(d => lit(d.toLowerCase)): _*))
  }
}
