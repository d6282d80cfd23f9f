package graft.robots

import graft.model.RobotsRule
import graft.url.UrlFunctions
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** robots.txt rules materialized as a broadcast table (BASELINE.json:6,
  * SURVEY.md §2 #16). The rules table is tiny relative to the frontier
  * (one row per host with rules) — always the broadcast side, so the filter
  * costs no shuffle. Longest-match semantics: a URL is allowed unless some
  * disallow prefix matches its path and no allow prefix of >= length also
  * matches (mirrors ReferenceCrawl.robotsAllows exactly; the higher-order
  * array functions are codegen'd built-ins).
  */
object Robots {

  /** longest matching prefix length over `prefixes` for `path`, or -1 */
  private def bestMatch(prefixes: Column, path: Column): Column =
    coalesce(
      array_max(transform(filter(prefixes, p => path.startsWith(p)), p => length(p))),
      lit(-1))

  def allowedCol(path: Column, disallow: Column, allow: Column): Column = {
    val dis = bestMatch(disallow, path)
    val alw = bestMatch(allow, path)
    disallow.isNull || dis === -1 || alw >= dis
  }

  /** PRECONDITION: one rule row per host. The reference model collapses
    * duplicates via Map (last wins); a broadcast join would instead multiply
    * frontier rows, silently corrupting crawl order. [[requireUniqueHosts]]
    * enforces this at loop construction.
    */
  def requireUniqueHosts(robots: Dataset[RobotsRule]): Unit = {
    val dups = robots.groupBy(col("host")).count().filter(col("count") > 1)
      .select("host").collect().map(_.getString(0))
    require(dups.isEmpty,
      s"robots table has duplicate rules for host(s): ${dups.mkString(", ")} — " +
        "collapse to one rule per host (reference semantics: last rule wins)")
  }

  /** Parse ONE robots.txt body into the engine's [[RobotsRule]] model
    * (REP / RFC 9309 subset, matching what the broadcast filter can
    * evaluate): the `User-agent: *` group's Disallow/Allow path prefixes
    * plus Crawl-delay (seconds, fractional ok → ms). Consecutive
    * User-agent lines share a group; keys are case-insensitive; `#`
    * comments strip; an EMPTY `Disallow:` value means allow-all and adds
    * no prefix; an unparseable or missing `*` group yields the permissive
    * empty rule. Agent-specific groups are ignored by design — the engine
    * crawls as one agent and the rule model is per-host, exactly what the
    * reference's broadcast-table contract (BASELINE.json:6) materializes.
    */
  def parseRobotsTxt(host: String, text: String): RobotsRule = {
    var inStar = false
    var agentRun = false // consecutive User-agent lines extend one group
    val dis = Vector.newBuilder[String]
    val alw = Vector.newBuilder[String]
    var delayMs = 0L
    if (text != null) for (raw <- text.linesIterator) {
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!agentRun) inStar = false // a NEW group starts; reset membership
            if (value == "*") inStar = true
            agentRun = true
          case _ =>
            agentRun = false
            if (inStar) key match {
              case "disallow" => if (value.nonEmpty) dis += value
              case "allow" => if (value.nonEmpty) alw += value
              case "crawl-delay" =>
                value.toDoubleOption.filter(d => d > 0 && d.isFinite)
                  .foreach(d => delayMs = math.round(d * 1000))
              case _ => () // sitemap etc.
            }
        }
      }
    }
    RobotsRule(host, dis.result(), alw.result(), delayMs)
  }

  /** Distributed materialization: (host, robots_txt) rows → the broadcast
    * rules table. The natural feed is the crawl's own fetches of
    * `http://host/robots.txt` (or a WARC archive's robots captures).
    */
  def fromTexts(robotsTxt: DataFrame, hostCol: String = "host",
                textCol: String = "robots_txt"): Dataset[RobotsRule] = {
    val spark = robotsTxt.sparkSession
    import spark.implicits._
    robotsTxt.select(col(hostCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .map { case (h, t) => parseRobotsTxt(h, t) }
  }

  /** Derive the rules table from the page store's own `/robots.txt`
    * captures — the zero-extra-input path for a store ingested from WARC
    * ([[graft.sources.Warc.toPages]] keeps robots.txt responses like any
    * other capture). One rule per host (multiple captures: latest warc_ts
    * wins, matching [[graft.crawl.PageStore.latestCapture]] semantics), so
    * the [[requireUniqueHosts]] precondition holds by construction.
    */
  def fromPages(pages: DataFrame, urlCol: String = "url", textCol: String = "text"): Dataset[RobotsRule] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val caps = pages
      .filter(UrlFunctions.pathOfUdf(col(urlCol)) === "/robots.txt")
      .select(UrlFunctions.hostOfUdf(col(urlCol)).as("host"),
        col("warc_ts"), col(textCol).as("robots_txt"))
      .groupBy(col("host"))
      .agg(max(struct(col("warc_ts"), col("robots_txt"))).as("m"))
      .select(col("host"), col("m.robots_txt").as("robots_txt"))
    fromTexts(caps)
  }

  /** Split `frontier` (needs url + host columns) into (allowed, dropped). */
  def partition(frontier: DataFrame, robots: Dataset[RobotsRule]): (DataFrame, DataFrame) = {
    val joined = frontier
      .join(broadcast(robots.toDF()), Seq("host"), "left")
      .withColumn("__allowed",
        allowedCol(UrlFunctions.pathOfUdf(col("url")), col("disallow"), col("allow")))
    val keep = frontier.columns.map(col)
    (joined.filter(col("__allowed")).select(keep: _*),
      joined.filter(!col("__allowed")).select(keep: _*))
  }
}
