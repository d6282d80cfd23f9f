package graft.url

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-trap detection — flag hosts whose URL space is generated, not
  * authored (calendar pages, session ids, faceted-search explosions), so
  * the frontier stops feeding them. The signal: collapse each URL to its
  * structural pattern (digit runs → `#`, query-parameter values → `=#`)
  * and compare how many distinct URLs a host has against how many
  * distinct PATTERNS they collapse to. An authored site keeps the ratio
  * near 1; a trap emits unbounded URLs from a handful of templates, so
  * the ratio grows without limit as the crawl ages — the classic
  * pattern-collapse heuristic (Heritrix's path-repetition / calendar
  * filters are the ancestral form).
  *
  * All figures are BIGINT (ratio in basis points) — value-oracle-able.
  *
  * Scale shape: one map-side collapse projection, then a two-level
  * hash aggregate: distinct on (host, url → pattern) pairs (map-side
  * combine bounds duplicate URLs), then per-host counts. No window, no
  * join; the output is host-cardinality, small enough to broadcast
  * back as a frontier filter.
  */
object Traps {

  /** digit runs → `#`; query-param values (`=...` up to `&`) → `=#` —
    * same two rules in the pure mirror and the oracle
    */
  def collapseUrl(url: Column): Column =
    regexp_replace(regexp_replace(url, "=[^&#]*", "=#"), "[0-9]+", "#")

  /** pure mirror */
  def collapseUrl(url: String): String =
    url.replaceAll("=[^&#]*", "=#").replaceAll("[0-9]+", "#")

  /** Per-host trap verdict over a URL table.
    * @param minUrls    hosts with fewer distinct URLs are never flagged
    *                   (not enough evidence)
    * @param minRatioBp flag when distinct-urls/distinct-patterns ≥ this,
    *                   in basis points (50000 = 5 URLs per template)
    * Returns (hostCol, n_urls, n_patterns, ratio_bp, trap).
    */
  def detect(urls: DataFrame, hostCol: String = "host",
             urlCol: String = "url", minUrls: Long = 100L,
             minRatioBp: Long = 50000L): DataFrame = {
    // NULL urls are not URLs: dropped up front, which also guarantees
    // n_patterns >= 1 for every surviving host (the div below is safe
    // under ANSI; a host with only NULL rows simply doesn't report)
    val pairs = urls
      .filter(col(urlCol).isNotNull)
      .select(col(hostCol), col(urlCol),
        collapseUrl(col(urlCol)).as("__pat"))
    // two single-distinct aggregates, NOT one dual count_distinct: two
    // distincts in one aggregate plan an Expand that doubles every input
    // row pre-shuffle. Collapse is a function (one pattern per URL), so
    // summing per-pattern distinct-URL counts over a host IS the host's
    // distinct-URL count — plain map-side-combining hash aggregates.
    val perPattern = pairs.groupBy(col(hostCol), col("__pat"))
      .agg(count_distinct(col(urlCol)).as("__u"))
    val perHost = perPattern.groupBy(col(hostCol)).agg(
      sum(col("__u")).as("n_urls"),
      count(lit(1)).as("n_patterns"))
    perHost.select(
      col(hostCol), col("n_urls"), col("n_patterns"),
      expr("n_urls * 10000 div n_patterns").as("ratio_bp"))
      .withColumn("trap",
        col("n_urls") >= minUrls && col("ratio_bp") >= minRatioBp)
  }
}
