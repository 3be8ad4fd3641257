package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for Common-Crawl-style page dedup (the first
  * dedup any web corpus runs: the same page is crawled under scheme/
  * host case variants, default ports, fragments, tracking params and
  * trailing slashes — cf. the WARC-dedup stage of public CC pipelines).
  *
  * Pure codegen'd string/array Columns — no UDF, no regex beyond what
  * both engines share — so the DuckDB oracle reproduces every rule
  * bit-for-bit:
  *
  *  1. drop the `#fragment`;
  *  2. lowercase scheme and host;
  *  3. strip the scheme's default port (https:443, http:80);
  *  4. drop `utm_*` tracking query params, sort the survivors
  *     (binary/codepoint order — both engines' default collation);
  *  5. empty path -> "/", strip one trailing slash off non-root paths.
  *
  * At 10^12 pages the canonical-url group key would be its 8-byte hash
  * (the exact-dedup discipline, DedupOps.exactDedup); the string key is
  * kept here because the oracle compares representative VALUES.
  */
object UrlOps {

  /** The `scheme://host[:port][/path][?query][#fragment]` decomposition
    * shared by [[canonicalizeUrl]] and [[hostOf]] — ONE parse chain, so
    * a rule change cannot silently diverge the two (the DuckDB mirror
    * derives both host and canon url from one chain too). */
  private case class UrlParts(scheme: Column, host: Column, port: Column,
      pathRaw: Column, qs: Column)

  private def parse(u: Column): UrlParts = {
    val noFrag = substring_index(u, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    // everything after the '?' ('' when absent: start > length)
    val qs = noFrag.substr(length(base) + 2, length(noFrag))
    val rawScheme = substring_index(base, "://", 1)
    val rest = base.substr(length(rawScheme) + 4, length(base))
    val hostport = substring_index(rest, "/", 1)
    val pathRaw = rest.substr(length(hostport) + 1, length(rest))
    val rawHost = substring_index(hostport, ":", 1)
    val port = hostport.substr(length(rawHost) + 2, length(hostport))
    UrlParts(lower(rawScheme), lower(rawHost), port, pathRaw, qs)
  }

  /** Rule 5: empty path -> "/", one trailing slash stripped off
    * non-root paths. */
  private def normPath(p: UrlParts): Column = {
    val path0 = when(p.pathRaw === "", lit("/")).otherwise(p.pathRaw)
    when(path0 =!= "/" && path0.endsWith("/"),
      path0.substr(lit(1), length(path0) - 1)).otherwise(path0)
  }

  /** Canonical form of a URL column (rules above). Assumes the
    * [[parse]] shape — the shape a crawler's frontier emits. */
  def canonicalizeUrl(u: Column): Column = {
    val p = parse(u)
    val defaultPort = (p.scheme === "https" && p.port === "443") ||
      (p.scheme === "http" && p.port === "80") || p.port === ""
    val params = array_join(
      sort_array(filter(split(p.qs, "&"), x => !x.startsWith("utm_"))), "&")
    concat(
      p.scheme, lit("://"), p.host,
      when(defaultPort, lit("")).otherwise(concat(lit(":"), p.port)),
      normPath(p),
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  /** The normalized path of a URL column (the canon form's path piece)
    * — what a blocklist's path-prefix rules match against. */
  def pathOf(u: Column): Column = normPath(parse(u))

  /** Anchor-href extraction pattern, held in the Java-regex ∩ RE2
    * common subset (the PiiOps discipline) so the IDENTICAL pattern
    * string runs in DuckDB's regexp_extract_all: the value of every
    * double-quoted href attribute. */
  val HrefRe = "href=\"([^\"]*)\""

  /** All href values in an HTML string column — the web-graph
    * extraction step (outlinks per page). Codegen'd
    * regexp_extract_all, no UDF; per-row work, embarrassingly
    * parallel. */
  def extractHrefs(html: Column): Column =
    regexp_extract_all(html, lit(HrefRe), lit(1))

  /** Full href-first anchor tags (`<a href="u" ...>text</a>`), same
    * Java∩RE2 discipline. Group 1 = href, group 2 = anchor text. */
  val AnchorRe = "<a href=\"([^\"]*)\"[^>]*>([^<]*)</a>"

  /** One row per anchor: struct(href, anchor). Spark's
    * regexp_extract_all returns ONE group per call, so full matches are
    * extracted once and the two groups pulled per element — still all
    * codegen'd string work, no UDF, map-side only. */
  def extractAnchors(html: Column): Column =
    transform(
      regexp_extract_all(html, lit(AnchorRe), lit(0)),
      m => struct(
        regexp_extract(m, AnchorRe, 1).as("href"),
        regexp_extract(m, AnchorRe, 2).as("anchor")))

  /** The lowercased host of a URL column (port and path stripped) —
    * the [[parse]] chain's host, pure string Columns. */
  def hostOf(u: Column): Column = parse(u).host
}
