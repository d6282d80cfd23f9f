package graft.model

import java.sql.Timestamp

/** Core data model for the Spark-native crawl engine (SURVEY.md §1.2).
  *
  * The input table shape (url, warc_ts, html, text, lang) is mandated by
  * BASELINE.json:15 ("Iceberg table of Common-Crawl-style web pages").
  * All other shapes are designed here for the batch-iterative frontier loop.
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** One frontier row. `(pord, pos)` is the structural FIFO enqueue key
  * (SURVEY.md §7.4): `pord` is the parent's fetch ordinal — an opaque long,
  * strictly monotone with the parent's own enqueue key across the whole
  * crawl — and `pos` the link index within the parent page. Crawl order is
  * lexicographic (round, pord, pos): exactly the reference's FIFO queue
  * order (children enqueue in parent-fetch order, then document order),
  * invariant under partitioning, parallelism level, and resume. CONSTANT
  * 16-byte key at any depth — unlike a path vector, which would grow 8
  * bytes per level and ride every shuffle and sort.
  * Seeds carry pord = -1 (before all fetched pages), pos = seed index.
  */
final case class FrontierEntry(
    url: String,
    urlHash: Long,
    host: String,
    depth: Int,
    pord: Long,
    pos: Long,
    attempt: Int)

/** A fetched-URL record; deterministic crawl order = (round, pord, pos).
  * pord/pos values are opaque (parallelism-dependent spacing); their ORDER
  * is the invariant.
  */
final case class CrawlOrderRow(
    url: String,
    round: Int,
    depth: Int,
    pord: Long,
    pos: Long)

/** Result of one runner (or the built-in pseudo-runners `__redirect__` /
  * `__fetch__`) on one URL — mirrors the reference's nested results object
  * flattened to columns (SURVEY.md §1.1).
  */
final case class RunnerResult(
    url: String,
    round: Int,
    runner: String,
    result: Option[String],
    error: Option[String])

/** Member of the exact URL-seen set (bloom shards are only a pre-filter;
  * exactness is required by BASELINE.json:6).
  */
final case class SeenEntry(url: String, urlHash: Long, round: Int)

/** robots.txt rules materialized as a broadcast table (BASELINE.json:6). */
final case class RobotsRule(
    host: String,
    disallow: Seq[String],
    allow: Seq[String],
    crawlDelayMs: Long)

/** Per-round, per-shard fetch lineage/metrics (BASELINE.json:14). */
final case class Lineage(
    round: Int,
    shard: Int,
    admitted: Long,
    fetched: Long,
    discovered: Long,
    dedupDropped: Long,
    robotsDropped: Long,
    budgetDeferred: Long,
    errors: Long,
    retries: Long,
    wallMs: Long)

/** URL admission policy — a small closed ADT so the Spark plan (Column
  * expressions) and the sequential reference oracle interpret *identical*
  * semantics. Mirrors crawlkit's `urlFilter` (drop) + same-domain test-suite
  * scoping; `RewritePrefix` mirrors urlFilter's rewrite capability.
  */
sealed trait UrlPolicy extends Serializable
object UrlPolicy {
  case object AllowAll extends UrlPolicy
  /** keep only URLs whose host is one of the seed hosts */
  case object SameDomain extends UrlPolicy
  /** drop URLs whose path starts with any of the prefixes */
  final case class DenyPathPrefix(prefixes: Seq[String]) extends UrlPolicy
  /** all policies must pass */
  final case class And(policies: Seq[UrlPolicy]) extends UrlPolicy
}

/** Optional URL rewrite applied after canonicalization, before policy —
  * mirrors crawlkit urlFilter returning a different URL.
  */
final case class UrlRewrite(fromPrefix: String, toPrefix: String)

/** Crawl configuration. Defaults transcribe crawlkit's documented defaults:
  * redirects not followed, 3 tries, no depth cap; `hostBudget` generalizes
  * the reference's global `concurrency` limit into the per-host politeness
  * budget demanded by the north rule (BASELINE.json:14).
  */
final case class CrawlConfig(
    followRedirects: Boolean = false,
    maxTries: Int = 3,
    hostBudget: Int = Int.MaxValue,
    policy: UrlPolicy = UrlPolicy.SameDomain,
    redirectPolicy: UrlPolicy = UrlPolicy.AllowAll,
    rewrite: Option[UrlRewrite] = None,
    maxRounds: Int = 64,
    maxDepth: Int = Int.MaxValue,
    /** Nominal wall-clock per crawl round in ms; > 0 ENFORCES each host's
      * robots crawlDelayMs as a per-round fetch budget:
      * min(hostBudget, max(1, roundWallMs / crawlDelayMs)). 0 = politeness
      * budget only (crawl-delay rules not enforced).
      */
    roundWallMs: Long = 0L,
    /** number of URL-seen bloom shards (and frontier hash shards) */
    shards: Int = 32,
    /** expected insertions per bloom shard (sizing) */
    bloomExpectedPerShard: Long = 1L << 20,
    bloomFpp: Double = 0.01,
    /** use the sharded bloom pre-filter in front of the exact anti-join */
    bloomPrefilter: Boolean = true,
    /** per-shard seen pre-filter structure: "bloom" (default) or "cuckoo"
      * (deletable, better FPR per bit at load — BASELINE.json:14 allows
      * either); both are zero-false-negative
      */
    seenFilterKind: String = "bloom",
    /** broadcast the frontier side of the fetch join when smaller than this */
    broadcastFrontierMaxRows: Long = 2_000_000L,
    /** salt factor for hosts whose admitted rows exceed one task's comfort */
    saltFactor: Int = 8,
    /** rewrite the seen set as one compacted snapshot every K rounds, so the
      * per-round read unions O(K) delta dirs instead of O(rounds) (Iceberg
      * analog: snapshot compaction)
      */
    compactSeenEvery: Int = 16)

/** A runner — the engine's typed-UDF surface (SURVEY.md §2 #12). Must be a
  * deterministic pure function for crawl parity; Left = error recorded under
  * the runner's key, Right = result.
  */
trait PageRunner extends Serializable {
  def apply(page: Page): Either[String, String]
}
