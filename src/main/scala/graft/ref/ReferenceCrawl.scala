package graft.ref

import scala.collection.mutable

import graft.extract.Extract
import graft.model._
import graft.url.{Policy, Urls}

/** Embedded sequential reference model (SURVEY.md §0.4, §5.2.1).
  *
  * `/root/reference/` is empty, so this pure-Scala crawler IS the executable
  * transcription of crawlkit's documented semantics (BASELINE.json:6:
  * same-domain policy, redirect handling, parallelism limits generalized to
  * per-host politeness budgets, retry-on-error, FIFO queue discovery) — the
  * oracle that the distributed Spark loop must match on BOTH the final
  * URL-seen set and the exact crawl ordering.
  *
  * ROUND SPEC (shared by this oracle and graft.crawl.CrawlRound — any edit
  * here must be mirrored there):
  *   0. frontier_0 = canonicalized seeds; seed i gets key (pord=-1, pos=i),
  *      depth 0; duplicates dropped; all marked seen at enqueue.
  *   1. Sort frontier by (pord, pos) — FIFO enqueue order, mirroring the
  *      reference's async.queue: a row's key is minted once, at enqueue,
  *      and never changes through deferral or retry.
  *   2. robots filter: drop entries whose host has a matching disallow
  *      pattern (RFC 9309 `*`/trailing-`$` wildcards) not overridden by an
  *      allow pattern of >= specificity (raw pattern length).
  *   3. politeness: per host, admit the first `budget` rows in sorted
  *      order; the rest are deferred unchanged to the next round. budget =
  *      hostBudget, capped (when cfg.roundWallMs > 0 and the host's robots
  *      rule sets crawlDelayMs > 0) to max(1, roundWallMs / crawlDelayMs) —
  *      the crawl-delay enforcement.
  *   4. fetch = lookup in the page store. Miss: attempt+1 < maxTries ->
  *      retry next round (key unchanged), else a `__fetch__` error result.
  *   5. Hit: the URL enters the crawl order (round, pord, pos) and receives
  *      the next fetch ordinal `ord` (monotone with fetch chronology).
  *      Redirect page (html = "Location: <t>"): record a `__redirect__`
  *      result; if followRedirects, canonicalize target against the page
  *      URL, apply redirectPolicy, child key = (ord, 0), depth+1.
  *      Normal page: run runners in sorted-key order (results/errors), then
  *      extract links in document order; link i canonicalizes against the
  *      page URL, rewrite applies, policy filters (vs seed hosts), depth cap
  *      applies; child key = (ord, i), depth+1.
  *   6. Candidates dedup: sort by (pord, pos), keep first occurrence per
  *      URL not already seen; survivors marked seen at enqueue.
  *   7. frontier_{R+1} = deferred ∪ retries ∪ fresh; stop when empty or
  *      maxRounds reached.
  *
  * Ordinal values here are dense (0,1,2,…); the distributed engine mints
  * sparse ordinals. Both are strictly monotone with the same fetch
  * chronology, so every derived ORDERING (the parity contract) is
  * identical; the numeric values themselves are opaque.
  */
object ReferenceCrawl {

  final case class RefEntry(url: String, host: String, depth: Int,
                            pord: Long, pos: Long, attempt: Int)

  final case class RefResult(
      order: Vector[CrawlOrderRow],
      seen: Set[String],
      results: Vector[RunnerResult],
      rounds: Int)

  private val entryOrd: Ordering[RefEntry] =
    Ordering.by((e: RefEntry) => (e.pord, e.pos))

  /** Trap detection over a seen-URL set — the sequential mirror of
    * [[graft.url.Traps.detect]]: per host, distinct URLs vs distinct
    * collapsed patterns ([[graft.url.Traps.collapseUrl]], the shared
    * spec), thresholds in the same units. Pure function of the seen set,
    * so both executions (and a resumed run) derive identical trap sets.
    */
  def detectTraps(seen: Iterable[String], minUrls: Long, minRatioBp: Long): Set[String] =
    seen.groupBy(Urls.hostOf).collect {
      case (h, urls)
          if urls.size >= minUrls &&
            urls.size.toLong * 10000L /
              urls.map(graft.url.Traps.collapseUrl).toSet.size >= minRatioBp =>
        h
    }.toSet

  def robotsAllows(rules: Map[String, RobotsRule], url: String, host: String): Boolean =
    rules.get(host) match {
      case None => true
      case Some(r) =>
        // RFC 9309 wildcard matching via the SHARED matcher
        // (graft.robots.Robots.matchLen) — one semantics for the oracle and
        // the Column-side broadcast filter, pinned against each other by
        // the parity suite
        val path = Urls.pathOf(url)
        val dis = r.disallow.map(p => graft.robots.Robots.matchLen(p, path)).maxOption.getOrElse(-1)
        if (dis < 0) true
        else {
          val alw = r.allow.map(p => graft.robots.Robots.matchLen(p, path)).maxOption.getOrElse(-1)
          alw >= dis
        }
    }

  def crawl(
      pages: Map[String, Page],
      robots: Seq[RobotsRule],
      seeds: Seq[String],
      cfg: CrawlConfig,
      runners: Map[String, PageRunner] = Map.empty): RefResult = {

    val rules = robots.map(r => r.host -> r).toMap
    val seen = mutable.HashSet[String]()
    val order = Vector.newBuilder[CrawlOrderRow]
    val results = Vector.newBuilder[RunnerResult]
    var nextOrd = 0L

    // post-canonicalize URL transform: prefix rewrite, then the opt-in
    // tracking-param strip — SAME composition as the Spark path's canonHost
    def post(u: String): String = {
      val r = Policy.rewrite(cfg.rewrite, u)
      if (cfg.stripTracking) Urls.stripTrackingParams(r) else r
    }
    var frontier: Vector[RefEntry] = seeds.zipWithIndex.flatMap { case (s, i) =>
      Urls.canonicalizeAbsolute(s)
        .map(u => if (cfg.stripTracking) Urls.stripTrackingParams(u) else u)
        .map(u => RefEntry(u, Urls.hostOf(u), 0, -1L, i.toLong, 0))
    }.filter(e => seen.add(e.url)).toVector
    val seedHosts = frontier.map(_.host).toSet
    // adaptive trap feedback (cfg.trapDetectEvery): hosts trapped at a
    // boundary stop enqueuing (never marked seen) and purge from the
    // carried frontier — entries enqueued BEFORE the boundary stay seen
    var trapHosts = Set.empty[String]

    var round = 0
    while (frontier.nonEmpty && round < cfg.maxRounds) {
      val sorted = frontier.sorted(entryOrd)
      val allowed = sorted.filter(e => robotsAllows(rules, e.url, e.host))
      // politeness budget; roundWallMs > 0 enforces robots crawl-delay
      // (mirror of CrawlRound's hostBudgets derivation)
      def budgetFor(host: String): Int = rules.get(host) match {
        case Some(r) if cfg.roundWallMs > 0 && r.crawlDelayMs > 0 =>
          math.min(cfg.hostBudget.toLong,
            math.max(1L, cfg.roundWallMs / r.crawlDelayMs)).toInt
        case _ => cfg.hostBudget
      }
      val hostCount = mutable.HashMap[String, Int]().withDefaultValue(0)
      val (admitted, deferred) = allowed.partition { e =>
        val c = hostCount(e.host)
        hostCount(e.host) = c + 1
        c < budgetFor(e.host)
      }

      val retries = Vector.newBuilder[RefEntry]
      val candidates = Vector.newBuilder[RefEntry]

      for (e <- admitted) pages.get(e.url) match {
        case None =>
          if (e.attempt + 1 < cfg.maxTries) retries += e.copy(attempt = e.attempt + 1)
          else results += RunnerResult(e.url, round, "__fetch__", None, Some("fetch-miss"))
        case Some(p) =>
          order += CrawlOrderRow(e.url, round, e.depth, e.pord, e.pos)
          val ord = nextOrd
          nextOrd += 1
          val htmlStr = Extract.htmlToString(p.html)
          Extract.redirectTarget(htmlStr) match {
            case Some(rawTarget) =>
              results += RunnerResult(e.url, round, "__redirect__", Some(rawTarget), None)
              if (cfg.followRedirects && e.depth + 1 <= cfg.maxDepth)
                for (t <- Urls.canonicalize(e.url, rawTarget)) {
                  val t2 = post(t)
                  val h = Urls.hostOf(t2)
                  if (!trapHosts(h) && Policy.allows(cfg.redirectPolicy, t2, h, seedHosts))
                    candidates += RefEntry(t2, h, e.depth + 1, ord, 0L, 0)
                }
            case None =>
              for ((k, fn) <- runners.toSeq.sortBy(_._1))
                results += (Runners.run(fn, p) match {
                  case Right(v)  => RunnerResult(e.url, round, k, Some(v), None)
                  case Left(err) => RunnerResult(e.url, round, k, None, Some(err))
                })
              if (e.depth + 1 <= cfg.maxDepth) {
                val links = Extract.extractLinks(htmlStr)
                for ((href, i) <- links.zipWithIndex; c <- Urls.canonicalize(e.url, href)) {
                  val c2 = post(c)
                  val h = Urls.hostOf(c2)
                  if (!trapHosts(h) && Policy.allows(cfg.policy, c2, h, seedHosts))
                    candidates += RefEntry(c2, h, e.depth + 1, ord, i.toLong, 0)
                }
              }
          }
      }

      val fresh = candidates.result().sorted(entryOrd).filter(c => seen.add(c.url))
      frontier = deferred ++ retries.result() ++ fresh
      round += 1
      if (cfg.trapDetectEvery > 0 && round % cfg.trapDetectEvery == 0) {
        trapHosts ++= detectTraps(seen, cfg.trapMinUrls, cfg.trapMinRatioBp)
        if (trapHosts.nonEmpty) frontier = frontier.filterNot(e => trapHosts(e.host))
      }
    }

    RefResult(order.result(), seen.toSet, results.result(), round)
  }
}
