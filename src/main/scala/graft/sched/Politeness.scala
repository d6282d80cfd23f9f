package graft.sched

import graft.model.CrawlConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host politeness budgets over a host-hash-partitioned priority queue
  * (BASELINE.json:6,14; SURVEY.md §2 #10/#15). Priority is the structural
  * BFS key (depth, seq) — secondary sort within host partitions.
  *
  * Skew (the Zipf mega-host): a plain `Window.partitionBy(host)` puts an
  * entire host into one task. For budgets that a single task can't comfortably
  * rank, a salted two-phase top-B runs first: phase 1 ranks within
  * (host, salt) and keeps `budget` rows per salt (a superset of the true
  * top-B, ≤ saltFactor·budget rows/host); phase 2 ranks that bounded
  * remainder exactly. Semantics identical to the unsalted window — the
  * reference-parity tests cover both paths.
  */
object Politeness {

  /** Split into (admitted, deferred). Input needs url/urlHash/host/depth/seq. */
  def partition(frontier: DataFrame, cfg: CrawlConfig): (DataFrame, DataFrame) = {
    val budget = cfg.hostBudget
    if (budget == Int.MaxValue) return (frontier, frontier.limit(0))
    val keep = frontier.columns.map(col)
    val byHost = Window.partitionBy(col("host")).orderBy(col("depth"), col("seq"))

    val preFiltered =
      if (cfg.saltFactor > 1) {
        // phase 1: salted over-selection, bounds any single task's sort input
        val bySalt = Window
          .partitionBy(col("host"), pmod(col("urlHash"), lit(cfg.saltFactor.toLong)))
          .orderBy(col("depth"), col("seq"))
        frontier
          .withColumn("__srn", row_number().over(bySalt))
          .filter(col("__srn") <= budget)
          .drop("__srn")
      } else frontier

    val ranked = preFiltered.withColumn("__rn", row_number().over(byHost))
    val admitted = ranked.filter(col("__rn") <= budget).select(keep: _*)
    // deferred = everything not admitted (includes phase-1 salted-out rows)
    val deferred = frontier.join(admitted.select("url"), Seq("url"), "left_anti")
    (admitted, deferred)
  }
}
