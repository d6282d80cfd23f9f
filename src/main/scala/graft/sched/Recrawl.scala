package graft.sched

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adaptive recrawl scheduling — turn a page's fetch history into a
  * revisit priority, the freshness half of a crawl scheduler: pages that
  * changed often when fetched get recrawled sooner; pages that never
  * change age out. Standard frequency-estimator shape (Cho &
  * Garcia-Molina's change-frequency crawl ordering) kept deliberately
  * integer-exact so the whole operator value-oracles:
  *
  *   - n_fetches: observations of the page
  *   - n_changes: consecutive fetch pairs whose content signature
  *     differs (lag over (ts, tiebreak) within the page)
  *   - change_rate_bp: n_changes * 10000 / (n_fetches - 1), basis
  *     points of observed intervals that changed (0 when only one fetch
  *     — no interval observed)
  *   - staleness_s: seconds from the page's last fetch to the history's
  *     own max timestamp ("now" is data-derived, NOT the wall clock, so
  *     the result is a pure function of the input)
  *   - priority: staleness_s * (change_rate_bp + 1) — all-BIGINT, so
  *     ranking ties break identically in any engine; the `+ 1` keeps
  *     never-changing pages aging linearly instead of freezing at 0
  *
  * Scale shape: ONE shuffle on the page key serves both the lag window
  * and the aggregate (same partitioning, Catalyst reuses the exchange);
  * per-page history is short (fetch counts, not content), so no skew
  * salting is needed — a page fetched a million times is a scheduler
  * bug upstream, not a data-shape this operator should normalize.
  * All division is on non-negative BIGINTs, so truncation == floor and
  * the figures match any SQL engine bit-for-bit.
  */
object Recrawl {

  /** @param history  fetch log: one row per (page, fetch)
    * @param pageCol  page identity
    * @param tsCol    fetch timestamp
    * @param sigCol   content signature at fetch time (hash, etag, …)
    * @param tieCol   deterministic order tiebreak for equal timestamps
    * Returns (pageCol, n_fetches, n_changes, change_rate_bp,
    * staleness_s, priority) — one row per page.
    */
  def schedule(history: DataFrame, pageCol: String = "page",
               tsCol: String = "ts", sigCol: String = "sig",
               tieCol: String = "fetch_id"): DataFrame = {
    // NTZ columns cast up front: only DIFFERENCES of epoch values are
    // used, so the zone chosen for the cast cancels out of every figure
    val tsMs = unix_millis(col(tsCol).cast("timestamp"))
    val w = Window.partitionBy(col(pageCol)).orderBy(col(tsCol), col(tieCol))
    val withPrev = history.select(
      col(pageCol), col(tsCol), col(sigCol),
      lag(col(sigCol), 1).over(w).as("__prev"))
    val perPage = withPrev.groupBy(col(pageCol)).agg(
      count(lit(1)).as("n_fetches"),
      count(when(col("__prev").isNotNull && col("__prev") =!= col(sigCol), 1))
        .as("n_changes"),
      max(tsMs).as("__last_ms"))
    // "now" branch reads the RAW history again ON PURPOSE: column
    // pruning reduces that scan to the ts column alone with a map-side
    // partial max and NO shuffle, which is strictly cheaper than the
    // alternative (deriving it from perPage re-runs the page-key
    // exchange + per-partition window sort just to fold one row)
    val nowMs = history.agg(max(unix_millis(col(tsCol).cast("timestamp"))).as("__now_ms"))
    perPage.crossJoin(broadcast(nowMs)).select(
      col(pageCol),
      col("n_fetches"),
      col("n_changes"),
      when(col("n_fetches") > 1,
        expr("n_changes * 10000 div (n_fetches - 1)")).otherwise(lit(0L))
        .as("change_rate_bp"),
      expr("(__now_ms - __last_ms) div 1000").as("staleness_s"))
      .withColumn("priority",
        expr("staleness_s * (change_rate_bp + 1)"))
  }
}
