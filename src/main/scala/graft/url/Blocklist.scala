package graft.url

import org.apache.spark.sql.{Column, DataFrame}
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
  * millions of entries. Matched (id, host) keys anti-join back against
  * the input — two equi-joins, zero nested loops, and the blocklist is
  * never collected to the driver.
  */
object Blocklist {

  /** pure mirror for tests/oracles: is `host` blocked by `dom`? */
  def blockedBy(host: String, dom: String): Boolean =
    host == dom || host.endsWith("." + dom)

  /** The dot-suffix chain of a pre-split label array:
    * `["a","b","c"]` → `["a.b.c", "b.c", "c"]`. Shared by [[Blocklist]]
    * and [[DomainSuffix]] — one copy of the tricky slice arithmetic;
    * callers pass a PRECOMPUTED parts column so split() runs once per
    * row, not once per suffix.
    */
  private[url] def suffixChain(parts: Column): Column = {
    val p = parts
    transform(sequence(lit(0), size(p) - 1),
      i => array_join(slice(p, i + 1, size(p) - i), "."))
  }

  /** Keep rows whose `hostCol` is NOT in (or under) any blocklist domain.
    * The verdict is per (idCol, hostCol) PAIR, so rows sharing an id but
    * carrying different hosts are judged independently (matching
    * [[blockedBy]] row semantics).
    * @param blocklist one column of apex/blocked domains, named `domCol`
    */
  def filterBlocked(rows: DataFrame, blocklist: DataFrame,
                    hostCol: String = "host", idCol: String = "doc_id",
                    domCol: String = "dom"): DataFrame = {
    val blockedKeys = rows
      .withColumn("__parts", split(col(hostCol), "\\."))
      .select(col(idCol), col(hostCol),
        explode(suffixChain(col("__parts"))).as("__sfx"))
      .join(blocklist.select(col(domCol).as("__sfx")), Seq("__sfx"), "left_semi")
      .select(col(idCol), col(hostCol))
      .distinct()
    rows.join(blockedKeys, Seq(idCol, hostCol), "left_anti")
  }
}
