package graft.url

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain blocklist filtering with subdomain semantics — drop a row when
  * its host equals a blocked domain OR sits under one (`ads.x.com` is
  * blocked by `x.com`), the standard crawl/corpus deny-list contract
  * (Pi-hole / UT1-style lists match whole registrable-domain subtrees).
  *
  * Scale shape — the naive form is a non-equi theta-join
  * (`host LIKE '%.' || dom`), which Spark can only plan as a nested-loop
  * over every (row, pattern) pair. Instead the host explodes into its
  * dot-suffix chain (`a.b.c` → `a.b.c`, `b.c`, `c` — bounded by label
  * count, ~4-6 in practice), turning subtree match into EQUALITY against
  * the blocklist: a hash semi-join that broadcasts when the list is
  * small and shuffles cleanly when a deployment's list has tens of
  * millions of entries. Matched ids anti-join back against the input —
  * two equi-joins, zero nested loops, and the blocklist is never
  * collected to the driver.
  */
object Blocklist {

  /** pure mirror for tests/oracles: is `host` blocked by `dom`? */
  def blockedBy(host: String, dom: String): Boolean =
    host == dom || host.endsWith("." + dom)

  /** Keep rows whose `hostCol` is NOT in (or under) any blocklist domain.
    * @param blocklist one column of apex/blocked domains, named `domCol`
    */
  def filterBlocked(rows: DataFrame, blocklist: DataFrame,
                    hostCol: String = "host", idCol: String = "doc_id",
                    domCol: String = "dom"): DataFrame = {
    // "a.b.c" -> ["a.b.c", "b.c", "c"]: every dot-boundary suffix
    val suffixes = expr(
      s"""transform(sequence(0, size(split($hostCol, '\\\\.')) - 1),
         |  i -> array_join(slice(split($hostCol, '\\\\.'), i + 1,
         |         size(split($hostCol, '\\\\.')) - i), '.'))""".stripMargin)
    val blockedIds = rows
      .select(col(idCol), explode(suffixes).as("__sfx"))
      .join(blocklist.select(col(domCol).as("__sfx")), Seq("__sfx"), "left_semi")
      .select(col(idCol))
      .distinct()
    rows.join(blockedIds, Seq(idCol), "left_anti")
  }
}
