package graft

import graft.model.RobotsRule
import graft.robots.Robots
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt TEXT parser (REP / RFC 9309 subset) → the engine's
  * broadcast-rule model: `*` group selection, consecutive user-agent
  * grouping, comments, empty-Disallow semantics, fractional Crawl-delay,
  * and the distributed (host, robots_txt) → RobotsRule materialization
  * feeding the same broadcast filter the crawl uses.
  */
class RobotsTxtSpec extends AnyFunSuite {
  import SparkTestBase.spark

  test("star group: disallow/allow prefixes and fractional crawl-delay") {
    val txt =
      """# robots for example
        |User-agent: googlebot
        |Disallow: /private
        |
        |User-agent: *
        |Disallow: /tmp/   # temp trees
        |Disallow: /cgi-bin
        |Allow: /tmp/public
        |Crawl-delay: 1.5
        |Sitemap: http://h.test/sitemap.xml
        |""".stripMargin
    val r = Robots.parseRobotsTxt("h.test", txt)
    assert(r === RobotsRule("h.test", Seq("/tmp/", "/cgi-bin"), Seq("/tmp/public"), 1500L))
  }

  test("consecutive user-agent lines share a group; a later group resets membership") {
    val txt =
      """User-agent: a
        |User-agent: *
        |Disallow: /x
        |
        |User-agent: b
        |Disallow: /only-for-b
        |""".stripMargin
    val r = Robots.parseRobotsTxt("h.test", txt)
    assert(r.disallow === Seq("/x"), "agent-b's rules must not leak into the * group")
  }

  test("empty Disallow means allow-all; missing * group is the permissive empty rule") {
    assert(Robots.parseRobotsTxt("h.test", "User-agent: *\nDisallow:\n") ===
      RobotsRule("h.test", Seq.empty, Seq.empty, 0L))
    assert(Robots.parseRobotsTxt("h.test", "User-agent: bot\nDisallow: /\n") ===
      RobotsRule("h.test", Seq.empty, Seq.empty, 0L))
    assert(Robots.parseRobotsTxt("h.test", null) ===
      RobotsRule("h.test", Seq.empty, Seq.empty, 0L))
  }

  test("fromPages: rules derive from the store's own /robots.txt captures, latest capture wins") {
    import spark.implicits._
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000)
    val pages = Seq(
      ("http://h0.test/robots.txt", ts(100), "User-agent: *\nDisallow: /old\n"),
      ("http://h0.test/robots.txt", ts(200), "User-agent: *\nDisallow: /new\nCrawl-delay: 3\n"),
      ("http://h1.test/robots.txt", ts(100), "User-agent: *\nDisallow: /\n"),
      ("http://h0.test/p/1", ts(100), "just a page mentioning robots.txt"))
      .toDF("url", "warc_ts", "text")
    val rules = Robots.fromPages(pages).collect().map(r => r.host -> r).toMap
    assert(rules.keySet === Set("h0.test", "h1.test"))
    assert(rules("h0.test").disallow === Seq("/new"), "latest capture wins")
    assert(rules("h0.test").crawlDelayMs === 3000L)
  }

  test("parsed rules drive the same broadcast filter (and crawl-delay budgets) the crawl uses") {
    import spark.implicits._
    val texts = Seq(
      ("h0.test", "User-agent: *\nDisallow: /p/1\nAllow: /p/12\nCrawl-delay: 2\n"),
      ("h1.test", "User-agent: *\nDisallow: /\n"))
      .toDF("host", "robots_txt")
    val rules = Robots.fromTexts(texts)
    val byHost = rules.collect().map(r => r.host -> r).toMap
    assert(byHost("h0.test").crawlDelayMs === 2000L)
    assert(byHost("h1.test").disallow === Seq("/"))

    val frontier = Seq(
      ("http://h0.test/p/10", "h0.test"), // blocked: /p/1 prefix
      ("http://h0.test/p/125", "h0.test"), // allowed: /p/12 overrides
      ("http://h0.test/q", "h0.test"), // allowed: no prefix
      ("http://h1.test/anything", "h1.test"), // blocked: /
      ("http://h2.test/x", "h2.test")) // no rule: allowed
      .toDF("url", "host")
    val (allowed, dropped) = Robots.partition(frontier, rules)
    assert(allowed.select("url").as[String].collect().toSet ===
      Set("http://h0.test/p/125", "http://h0.test/q", "http://h2.test/x"))
    assert(dropped.count() === 2L)

    // and the pure parser agrees with the sequential oracle's matcher
    val ruleMap = byHost.map { case (h, r) => h -> r }
    assert(!graft.ref.ReferenceCrawl.robotsAllows(ruleMap, "http://h0.test/p/10", "h0.test"))
    assert(graft.ref.ReferenceCrawl.robotsAllows(ruleMap, "http://h0.test/p/125", "h0.test"))
  }
}
