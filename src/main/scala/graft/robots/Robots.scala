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
