package graft.url

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Registrable-domain extraction against a public-suffix list — the
  * grouping key real crawl policy runs on (per-SITE politeness, caps,
  * blocklists: `a.ads.example.co.uk` and `www.example.co.uk` are one
  * registrant, `example.co.uk`). Longest-match semantics over exact PSL
  * entries: the public suffix of a host is its LONGEST dot-suffix present
  * in the list; the registrable domain is that suffix plus one more
  * label. A host that IS a public suffix has no registrable domain
  * (null); a host matching nothing falls back to the PSL default rule
  * (last label is the suffix). Wildcard/exception PSL rules are out of
  * scope — entries are exact, which covers the overwhelming bulk of the
  * published list.
  *
  * Scale shape: the host's dot-suffix chain explodes map-side (bounded
  * by label count, ~4-6; [[Blocklist.suffixChain]], one split per row),
  * equi-joins the suffix list (the planner broadcasts at the published
  * list's ~10k size and shuffle-joins beyond — no forced hint), and the
  * longest match is a min-index aggregate keyed on (id, host) — correct
  * even when ids repeat with different hosts, no nested loop, no
  * per-pattern scan.
  */
object DomainSuffix {

  /** pure mirror for the crawl loop / tests: (public suffix, registrable) */
  def resolve(host: String, psl: Set[String]): (String, Option[String]) = {
    val parts = host.split('.')
    val mi = (0 until parts.length)
      .find(i => psl.contains(parts.drop(i).mkString(".")))
      .getOrElse(parts.length - 1)
    val suffix = parts.drop(mi).mkString(".")
    val registrable = if (mi > 0) Some(parts.drop(mi - 1).mkString(".")) else None
    (suffix, registrable)
  }

  /** Annotate each row with (public_suffix, registrable) from `hostCol`.
    * @param psl one column of exact public-suffix entries, named `sfxCol`
    */
  def annotate(rows: DataFrame, psl: DataFrame, hostCol: String = "host",
               idCol: String = "doc_id", sfxCol: String = "sfx"): DataFrame = {
    val withParts = rows.withColumn("__parts", split(col(hostCol), "\\."))
    val chain = withParts.select(col(idCol), col(hostCol),
      posexplode(Blocklist.suffixChain(col("__parts"))).as(Seq("__i", "__sfx")))
    val matched = chain
      .join(psl.select(col(sfxCol).as("__sfx")), Seq("__sfx"), "left_semi")
      .groupBy(col(idCol), col(hostCol)).agg(min(col("__i")).as("__mi"))
    withParts.join(matched, Seq(idCol, hostCol), "left")
      .withColumn("__mi", coalesce(col("__mi"), size(col("__parts")) - 1))
      .withColumn("public_suffix",
        expr("array_join(slice(__parts, __mi + 1, size(__parts) - __mi), '.')"))
      .withColumn("registrable",
        when(col("__mi") > 0,
          expr("array_join(slice(__parts, __mi, size(__parts) - __mi + 1), '.')")))
      .drop("__parts", "__mi")
  }
}
