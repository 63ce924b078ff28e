package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Web-corpus curation: URL canonicalization, registered-domain extraction,
 * URL-level dedup, and per-domain rollups — the curation steps every
 * crawl-derived training corpus runs before any text-level gate (C4 dedupes
 * at the URL level first; domain allow/block-lists and per-domain quality
 * budgets key on the registered domain).
 *
 * All ops are pure codegen'd projections over built-ins (`parse_url`,
 * array HOFs) — zero shuffle until an op's own aggregation, so they
 * compose into both batch scans and append streams. At 100 TB the
 * normalized URL replaces the raw one as the dedup/grouping key: a short
 * canonical string instead of the arbitrarily-long raw form (the same
 * shuffle-payload discipline as md5-keyed exact dedup).
 */
object Web {

  /** Per-key tracking parameters dropped by [[normalizeUrl]] (any `utm_*`
    * key is dropped by prefix as well). The list is the common public
    * click-id set; extend per deployment. */
  val trackingParamKeys: Seq[String] =
    Seq("ref", "fbclid", "gclid", "msclkid", "igshid", "mc_eid")

  /** Lower-cased hostname (port dropped — `parse_url` HOST is the bare
    * authority host). */
  def hostOf(url: Column): Column = lower(parse_url(url, lit("HOST")))

  /**
   * Canonical URL: lower-cased scheme and host, default/explicit port
   * dropped, trailing path slashes stripped, fragment dropped, tracking
   * parameters (`utm_*` by prefix + [[trackingParamKeys]]) removed, and the
   * surviving query parameters SORTED — so two crawls of one page that
   * differ only in parameter order or click-ids collapse to one key.
   * A query left empty after tracking removal drops its `?` entirely.
   */
  def normalizeUrl(url: Column): Column = {
    val proto = lower(parse_url(url, lit("PROTOCOL")))
    val host = hostOf(url)
    val path = regexp_replace(parse_url(url, lit("PATH")), "/+$", "")
    val query = coalesce(parse_url(url, lit("QUERY")), lit(""))
    val params = when(query === "", array().cast("array<string>"))
      .otherwise(split(query, "&"))
    val kept = filter(params, p =>
      !(p.rlike("^utm_") ||
        element_at(split(p, "="), 1).isin(trackingParamKeys: _*)))
    concat(proto, lit("://"), host, path,
      when(size(kept) > 0, concat(lit("?"), array_join(array_sort(kept), "&")))
        .otherwise(lit("")))
  }

  /** Multi-label public suffixes recognized by [[registeredDomain]] — a
    * deliberately small literal stand-in for the public-suffix list (the
    * real list is a data file; the LOOKUP SHAPE — a plan-time literal set,
    * broadcast-free — is what scales, and is identical at 9k suffixes). */
  val multiLabelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br", "co.in")

  /**
   * Registered (apex) domain of a lower-cased host: the last two labels,
   * or three when the trailing two form a multi-label public suffix
   * (`src.co.uk` → `src.co.uk`, `www.src.com` → `src.com`). Hosts with a
   * single label (e.g. `localhost`) pass through unchanged.
   */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(n >= 3 && lastTwo.isin(multiLabelSuffixes: _*),
      concat_ws(".", element_at(labels, -3), lastTwo))
      .when(n >= 2, lastTwo)
      .otherwise(host)
  }

  /**
   * URL-level exact dedup (the C4 first pass): one keeper per canonical
   * URL — the MIN id, deterministic — plus the collapsed-copy count. The
   * exchange carries the canonical string, not the document; at crawl
   * scale swap in `md5(url_norm)` as the grouping key for fixed-width
   * shuffle rows (the md5-keyed `dedup_exact` discipline) and keep
   * `url_norm` via the min-by struct.
   */
  def urlDedup(df: DataFrame, idCol: Column, urlCol: Column): DataFrame =
    df.select(idCol.as("doc_id"), normalizeUrl(urlCol).as("url_norm"))
      .groupBy(col("url_norm"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))

  /**
   * Per-registered-domain corpus rollup — the table a domain allow/block
   * list or per-domain sampling budget is built from: document count,
   * distinct canonical URLs (near-duplicate crawl pressure shows as
   * n_docs ≫ n_urls), and total characters. One partial-aggregated
   * exchange on the domain key; cardinality is the registered-domain
   * count (millions at crawl scale — fine for a hash aggregate).
   */
  def domainStats(df: DataFrame, idCol: Column, urlCol: Column,
      nCharsCol: Column): DataFrame =
    df.select(idCol.as("doc_id"),
        registeredDomain(hostOf(urlCol)).as("registered_domain"),
        normalizeUrl(urlCol).as("url_norm"), nCharsCol.as("n_chars"))
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url_norm")).as("n_urls"),
        sum(col("n_chars")).as("total_chars"))
}
