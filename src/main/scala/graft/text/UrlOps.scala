package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation for crawl corpora: canonicalization (the CCNet/C4-class
  * URL-dedup key), registrable-domain extraction (eTLD+1 against an
  * embedded two-level suffix list), and per-domain dedup statistics.
  *
  * Canonicalization, precisely (documented because the DuckDB oracle
  * mirrors it step for step):
  *   1. scheme and host lowercase; userinfo (`user@`) stripped
  *   2. leading `www.` stripped from the host
  *   3. default ports dropped (http:80, https:443); others kept
  *   4. fragment dropped
  *   5. query split on `&`; empty params and tracking params
  *      (`utm_*`, `fbclid`, `gclid`, `ref`) dropped; the rest sorted
  *      byte-wise and rejoined
  *   6. trailing slashes stripped from the path; an empty path
  *      becomes `/`
  * URLs with no `scheme://` prefix pass through unchanged. Assumes the
  * first `?` starts the query (true of well-formed URLs; a `?` inside
  * a fragment of a query-less URL would be misread — crawler inputs
  * are pre-split on `#` anyway).
  *
  * Everything here is a row-local string/array projection — no
  * shuffle, no UDF; canonicalizing 100 TB of URLs runs at scan speed.
  * The dedup stats are one groupBy keyed by registrable domain
  * (web-scale key space, heavy-tailed by nature — counts are
  * map-side-combinable longs). */
object UrlOps {

  /** Params dropped during canonicalization (prefix match on
    * `name=`). */
  val trackingParamPattern = "^(utm_|fbclid=|gclid=|ref=)"

  /** Two-level public suffixes for registrable-domain extraction —
    * a deliberately small embedded subset of the public-suffix list
    * covering the common ccTLD second levels; swap in the full list
    * for production crawls. */
  val defaultMultiSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "com.br", "net.br", "org.br",
    "com.mx", "com.ar", "com.cn", "net.cn", "org.cn",
    "co.in", "net.in", "org.in", "co.nz", "net.nz", "org.nz",
    "com.sg", "com.tr", "com.tw", "co.za", "com.hk", "com.my",
    "co.id", "com.ph", "com.vn", "co.th", "com.eg", "com.sa")

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val authorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, schemeRe, 1))

  /** host:port after userinfo strip, lowercased. */
  private def hostPort(url: Column): Column =
    lower(element_at(split(regexp_extract(url, authorityRe, 1), "@"), -1))

  /** Canonical host: lowercase, userinfo and port stripped, leading
    * `www.` removed. */
  def hostOf(url: Column): Column =
    regexp_replace(element_at(split(hostPort(url), ":"), 1), "^www\\.", "")

  private def portOf(url: Column): Column = {
    val hp = split(hostPort(url), ":")
    when(size(hp) > 1, element_at(hp, 2)).otherwise(lit(""))
  }

  private def canonicalQuery(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(q, "&"),
      x => x =!= "" && !x.rlike(trackingParamPattern))
    array_join(array_sort(kept), "&")
  }

  private def canonicalPath(url: Column): Column = {
    val p = regexp_replace(regexp_extract(url, pathRe, 1), "/+$", "")
    when(p === "", lit("/")).otherwise(p)
  }

  /** The canonical form per the object doc. Row-local. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = schemeOf(url)
    val port = portOf(url)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val q = canonicalQuery(url)
    when(scheme === "", url).otherwise(concat(
      scheme, lit("://"), hostOf(url),
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      canonicalPath(url),
      when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** eTLD+1: the last two host labels, or the last three when the
    * last two form a listed second-level public suffix. A bare
    * single-label host passes through. */
  def registrableDomain(host: Column,
                        suffixes: Seq[String] = defaultMultiSuffixes): Column = {
    val labels = split(host, "\\.")
    val lastTwo = array_join(slice(labels, -2, 2), ".")
    when(size(labels) >= 3 && lastTwo.isin(suffixes: _*),
         array_join(slice(labels, -3, 3), "."))
      .when(size(labels) >= 2, lastTwo)
      .otherwise(host)
  }

  /** Per-registrable-domain URL dedup statistics: raw URL count,
    * distinct canonical forms, and the share of rows a
    * canonical-key dedup would drop. The crawl-frontier health
    * report: a domain with a high dup_ratio is serving the same
    * pages under tracking-param/slash variants. */
  def urlDedupStats(df: DataFrame, urlCol: String): DataFrame = {
    df.select(
        registrableDomain(hostOf(col(urlCol))).as("domain"),
        canonicalizeUrl(col(urlCol)).as("__canon"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).cast("long").as("n_urls"),
           countDistinct(col("__canon")).cast("long").as("n_canonical"))
      .withColumn("dup_ratio",
        round((col("n_urls") - col("n_canonical")).cast("double") /
              col("n_urls"), 4))
  }
}
