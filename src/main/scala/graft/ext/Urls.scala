package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup lever of every web-scale corpus
  * pipeline: mirror URLs differing only in case, default ports, tracking
  * params, parameter order, trailing slashes, or fragments are the SAME
  * document, and collapsing them before any content fetch or hash is the
  * cheapest dedup available (it needs no bytes, just the key).
  *
  * Pure built-in-function composition (regexp_extract + array ops), fully
  * codegen-friendly and replayable by a SQL oracle — no UDF. Map-only at
  * any scale: canonicalization is a projection; the dedup downstream is
  * one groupBy on the canonical key.
  */
object Urls {

  /** Canonical form of an absolute http(s)-style URL:
    *  - scheme and host lowercased
    *  - default ports dropped (http:80, https:443); explicit non-default
    *    ports kept
    *  - trailing slashes stripped from the path (root stays `/`; an empty
    *    path becomes `/`)
    *  - query params: `utm_`-prefixed tracking params dropped, the rest
    *    sorted bytewise and re-joined; an emptied query loses its `?`
    *  - fragment dropped
    * Malformed input (no `scheme://`) is returned lowercased as-is —
    * garbage keys still dedup against identical garbage. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = lower(regexp_extract(hostport, "^([^:]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(regexp_replace(rawPath, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => length(p) > 0 && substring(p, 1, 4) =!= "utm_")), "&")
    val queryPart = when(params === "", lit(""))
      .otherwise(concat(lit("?"), params))
    when(scheme === "", lower(url))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }
}
