package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization rules — ONE implementation shared by the
  * engine sides of u1_url_canon, u2_url_dedup (and any future
  * url-keyed op); the DuckDB mirror is `OpsQueries.urlCanonCtesFor`.
  * Change the rules ONLY in lockstep with that builder (CLAUDE.md
  * coupling inventory).
  *
  * Rules (crawl-frontier canonical form, cf. reference extractor's
  * source-URL normalization): lowercase scheme+host, strip the
  * scheme's default port (:80 for http, :443 for https), drop the
  * fragment, drop tracking params (utm_*, fbclid, gclid), sort the
  * surviving query params. Entirely row-local regexp + array
  * built-ins — codegen end to end, no shuffle, no UDF, so the
  * canonicalizer costs the same per row at 100 TB as at test scale.
  */
private[ops] object UrlCanon {

  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z]+)://", 1))

  /** lowercased host, scheme-default port stripped */
  def host(url: Column): Column = {
    val hostport = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val s = scheme(url)
    when(s === "http", regexp_replace(hostport, ":80$", ""))
      .when(s === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
  }

  def path(url: Column): Column =
    regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)

  /** all non-empty query params (before tracking-param removal) */
  def params(url: Column): Column =
    filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"), p => p =!= "")

  /** params surviving the tracking blocklist */
  def keptParams(url: Column): Column =
    filter(params(url), p =>
      !startswith(p, lit("utm_")) && !startswith(p, lit("fbclid=")) &&
        !startswith(p, lit("gclid=")))

  def nTracking(url: Column): Column =
    size(params(url)) - size(keptParams(url))

  /** full canonical URL: scheme://host path ?sorted-kept-params */
  def canon(url: Column): Column = {
    val kept = keptParams(url)
    concat(scheme(url), lit("://"), host(url), path(url),
      when(size(kept) > 0, concat(lit("?"), array_join(array_sort(kept), "&")))
        .otherwise(lit("")))
  }
}
