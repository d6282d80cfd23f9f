package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The crawl loop itself is deliberately
  * batch-iterative (BASELINE.json:6 — one typed Dataset job per round), but
  * the engine exposes streaming equivalents of its two streaming-shaped
  * concerns: windowed event/metric aggregation with watermarked late-data
  * handling, and an incremental URL-seen filter as keyed state
  * (flatMapGroupsWithState) for pipelines that receive discovered links as
  * a stream.
  */
object Streaming {

  /** tumbling-window per-type counts; rows later than `watermark` are
    * dropped and windows finalize once the watermark passes them
    */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String = "ts",
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sv"))

  final case class UrlEvent(host: String, url: String)

  /** Streaming URL-seen filter: emits each URL the first time it is ever
    * seen, keyed by host so state partitions the way the batch engine's
    * bloom shards do. State per host is the exact seen set — at web scale
    * the state store holds it off-heap/on-disk (RocksDB provider on a real
    * cluster); the batch loop's sharded-bloom + anti-join remains the
    * 10^10-scale path, this is the streaming-ingest variant.
    */
  def streamingSeenFilter(spark: SparkSession, urls: Dataset[UrlEvent]): Dataset[String] = {
    import spark.implicits._
    urls
      .groupByKey(_.host)
      .flatMapGroupsWithState[Set[String], String](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[UrlEvent], state: GroupState[Set[String]]) =>
          val seen = state.getOption.getOrElse(Set.empty[String])
          val fresh = scala.collection.mutable.LinkedHashSet[String]()
          rows.foreach { r => if (!seen.contains(r.url)) fresh += r.url }
          state.update(seen ++ fresh)
          fresh.iterator
      }
  }
}
