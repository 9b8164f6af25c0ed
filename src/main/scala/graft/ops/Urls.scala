package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl curation — the normalization a host-level
  * pipeline runs before dedup keys, host rollups, and the graph family's
  * node keys (q128/q133 consume host ids; Common Crawl's index stores the
  * SURT-canonicalized form for exactly this reason). `util/Hosts.scala`
  * parses host:port service endpoints; this handles the web-URL shape:
  *
  *  - scheme and host LOWERCASE (RFC 3986 §6.2.2.1 — both are
  *    case-insensitive; paths are NOT, so the path's case is preserved);
  *  - default ports dropped (`:80` for http, `:443` for https);
  *  - tracking query parameters removed (`utm_*`, `fbclid`, `gclid`,
  *    `msclkid`, `mc_eid` — the click-ID family that makes every shared
  *    link a unique URL), keeping all other parameters IN ORIGINAL ORDER;
  *  - a trailing path slash dropped (`/a/b/` ≡ `/a/b`, `host/` ≡ `host`);
  *  - an emptied query (`?` alone, or every param tracked) dropped.
  *
  * Mechanics are deliberately regex-LITE: the query string is handled by
  * split → filter → rejoin (native higher-order functions on both engines)
  * instead of iterated regexp_replace surgery, and the few regexes used
  * sit in the RE2 ∩ java.regex subset (the q93 scrub discipline: no
  * lookaround, no backreferences — DuckDB's regexp engine IS RE2), so the
  * DuckDB oracle replays byte-identical canonical forms. Fragments (`#`)
  * are assumed absent — crawl frontiers strip them at discovery time.
  *
  * Scale shape: a pure scan-side projection (codegen'd, no UDF, no
  * shuffle); the host extraction feeds rollups whose key space is the
  * host vocabulary.
  */
object Urls {

  private val TrackedParam = "^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid)="

  /** Canonical form of a web URL per the rules above. */
  def canonicalize(u: Column): Column = {
    // base = scheme://host[:port][/path], query = what follows '?'
    val base = regexp_extract(u, "^([^?]*)", 1)
    val query = when(u.contains("?"),
      regexp_replace(u, "^[^?]*\\?", "")).otherwise(lit(""))
    // lowercase scheme://host[:port] (ends at the first path '/');
    // path case is preserved
    val lowered = concat(
      lower(regexp_extract(base, "^([^/]*//[^/]*)", 1)),
      regexp_replace(base, "^[^/]*//[^/]*", ""))
    // default ports (anchored to the end of the host: the path, if any,
    // starts at the first '/')
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:]*):80(/.*)?$", "$1$2"),
      "^(https://[^/:]*):443(/.*)?$", "$1$2")
    // ONE trailing path slash ('//' of the scheme is guarded by [^/])
    val noSlash = regexp_replace(noPort, "([^/])/$", "$1")
    // query params: split → drop tracked + empties → rejoin in order
    val kept = array_join(
      filter(split(query, "&"),
        p => p =!= "" && !p.rlike(TrackedParam)), "&")
    concat(noSlash, when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** The lowercased host (no port) of a URL — the rollup / graph node key. */
  def host(u: Column): Column =
    lower(regexp_extract(u, "^[^/]*//([^/?#:]*)", 1))
}
