package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + host-blocklist filtering — the web-corpus
  * hygiene pair every crawl-derived training pipeline runs before dedup
  * (a URL-keyed dedup is only as good as its key: the same page arrives
  * as `HTTPS://Host:443/p?b=2&utm_x=1&a=1#f` and `https://host/p?a=1&b=2`
  * and must collapse).
  *
  * Everything here is row-local Column composition over
  * `org.apache.spark.sql.functions` (regexp + higher-order array ops) —
  * no UDF, no shuffle introduced by the canonicalizer itself; at 100 TB
  * the cost is the scan. The DuckDB oracle mirrors each step 1:1
  * (regexp_extract / list_filter / list_sort), so the canonical form is
  * an engine-portable contract, not an implementation accident.
  *
  * Canonical form (conservative, lossless for ranking purposes):
  *   - scheme and host lowercased
  *   - default ports stripped (:80 for http, :443 for https); any other
  *     explicit port kept
  *   - fragment dropped (never reaches the server)
  *   - tracking params dropped (utm_*, gclid, fbclid, ref), remaining
  *     params sorted bytewise; empty query drops the '?'
  *   - trailing slashes collapsed off the path; empty path → '/'
  * Deliberately NOT done (these change semantics): percent-decoding,
  * case-folding the path, resolving dot-segments, IDN/punycode.
  */
object UrlOps {

  private val TrackingRe = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="

  /** Lowercased host of a URL (no port), '' when not parseable. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(
      regexp_extract(
        regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", ""),
        "^([^/?#]*)", 1),
      "^([^:]*)", 1))

  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noFrag = regexp_replace(afterScheme, "#.*$", "")
    val hostPort = regexp_extract(noFrag, "^([^/?]*)", 1)
    val rest = regexp_replace(noFrag, "^[^/?]*", "")
    val host = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingRe))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, portPart, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** All dot-suffixes of a host as an array: `a.b.c` → [`a.b.c`, `b.c`,
    * `c`]. Row-local; bounded by the label count (public-suffix hosts
    * have ≤ ~8 labels). The primitive both blocklist paths share. */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
  }

  /** Small-list path: blocked iff any suffix of `host` is in the literal
    * list — a row-local `arrays_overlap` against a constant array; no
    * join, no broadcast, pure scan-speed. Right up to ~10⁴ entries. */
  def blockedBySuffix(host: Column, blocked: Seq[String]): Column = {
    require(blocked.nonEmpty, "blocklist must be non-empty")
    arrays_overlap(hostSuffixes(host), lit(blocked.map(_.toLowerCase).toArray))
  }

  /** Large-list path: the RPZ-scale shape. Hosts explode into their
    * ≤~8 label-suffixes, which turns "host ends with .suffix" into an
    * EQUI-join against the blocklist relation — broadcast when the list
    * fits, plain shuffled hash join when it is itself huge (millions of
    * suffixes); never a LIKE/theta join. Output: df + `blocked` flag.
    *
    * Rows whose host yields no suffix (null/empty) come back
    * blocked=false — hygiene filters quarantine unparseable rows
    * explicitly upstream, they don't silently drop them here.
    */
  def blocklistJoin(df: DataFrame, hostCol: Column,
                    blocklist: DataFrame): DataFrame = {
    require(blocklist.columns.sameElements(Array("suffix")),
      s"blocklist must have exactly one column 'suffix', got: " +
        blocklist.columns.mkString(", "))
    val clash = df.columns.toSet
      .intersect(Set("_host", "_blocked", "blocked"))
    require(clash.isEmpty,
      s"input already has reserved column(s) ${clash.mkString(", ")} — " +
        "rename before blocklistJoin (output adds `blocked`)")
    val withId = df.withColumn("_host", lower(hostCol))
    val hits = withId
      .select(col("_host"))
      .distinct()
      .select(col("_host"), explode(hostSuffixes(col("_host"))).as("suffix"))
      .join(blocklist.select(lower(col("suffix")).as("suffix")), Seq("suffix"))
      .select(col("_host")).distinct()
      .withColumn("_blocked", lit(true))
    withId.join(hits, Seq("_host"), "left")
      .withColumn("blocked", coalesce(col("_blocked"), lit(false)))
      .drop("_host", "_blocked")
  }
}
