package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, round => sqlRound, sum, window, xxhash64}
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
      .agg(count(lit(1)).as("n"), sqlRound(sum(col("value")), 4).as("sv"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sv"))

  final case class UrlEvent(host: String, url: String)

  /** Streaming exact content-dedup — the streaming analog of
    * [[graft.ops.Dedup.exactDedup]]: emits each document the FIRST time
    * its content is seen, keyed by the same sha-256 content key the batch
    * pass clusters on (32 bytes of state per distinct content, never the
    * text). Unbounded state by default (exact forever-dedup); pass
    * `tsCol` + `watermark` to bound state via
    * `dropDuplicatesWithinWatermark` — dedup within the watermark horizon,
    * the standard streaming trade for infinite ingest. Same RocksDB
    * state-store note as [[streamingSeenFilter]].
    */
  def streamingContentDedup(pages: DataFrame, textCol: String = "text",
                            tsCol: String = "", watermark: String = ""): DataFrame = {
    val hashed = pages.withColumn("__ch",
      org.apache.spark.sql.functions.sha2(col(textCol), 256))
    val dd =
      if (tsCol.nonEmpty && watermark.nonEmpty)
        hashed.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark("__ch")
      else hashed.dropDuplicates("__ch")
    dd.drop("__ch")
  }

  /** Streaming per-host politeness: emit at most `budget` URLs per host
    * per micro-batch; the overflow buffers in keyed state (FIFO, capped)
    * and drains `budget`-at-a-time in later batches — the streaming
    * analog of the batch loop's per-host fetch budget. Emission order is
    * deterministic: the carried queue first, then the batch's new
    * arrivals sorted by URL (iterator order off a shuffle is not stable;
    * the sort makes replay/recovery byte-identical).
    *
    * State per host = the buffered URL queue, capped at `maxBuffer` —
    * beyond it, excess URLs are DROPPED LOUDLY into the emitted stream as
    * a `dropped:` marker row rather than silently vanishing or growing
    * state without bound (a trap host upstream should be caught by
    * [[graft.url.Traps]], not buffered forever). With
    * `drainTimeoutMs > 0`, hosts with buffered work and no fresh input
    * re-fire on a processing-time timeout and keep draining; 0 keeps the
    * operator fully data-driven (a batch mentioning the host drains it),
    * which is also the deterministic mode the spec exercises. Same
    * RocksDB state-store note as [[streamingSeenFilter]].
    */
  def rateLimitPerHost(spark: SparkSession, urls: Dataset[UrlEvent],
                       budget: Int, maxBuffer: Int = 100000,
                       drainTimeoutMs: Long = 0L): Dataset[UrlEvent] = {
    import spark.implicits._
    require(budget > 0 && maxBuffer >= 0)
    val timeout =
      if (drainTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    urls.groupByKey(_.host)
      .flatMapGroupsWithState[Vector[String], UrlEvent](
        OutputMode.Append(), timeout) {
        (host: String, rows: Iterator[UrlEvent], state: GroupState[Vector[String]]) =>
          val queued = state.getOption.getOrElse(Vector.empty)
          val fresh = rows.map(_.url).toVector.sorted
          val all = queued ++ fresh
          val (emit, rest) = all.splitAt(budget)
          val (keep, overflow) = rest.splitAt(maxBuffer)
          if (keep.nonEmpty) {
            state.update(keep)
            if (drainTimeoutMs > 0) state.setTimeoutDuration(drainTimeoutMs)
          } else state.remove()
          (emit.map(UrlEvent(host, _)) ++
            overflow.map(u => UrlEvent(host, s"dropped:$u"))).iterator
      }
  }

  /** Streaming URL-seen filter: emits each URL the first time it is ever
    * seen. Designed to BOUND per-key state at web scale:
    *
    *   - state key = (host, urlHash mod `bands`): a mega-host's seen set
    *     splits across `bands` independent state shards instead of one
    *     unbounded Set per host — no single state entry holds a whole host.
    *   - state value = Set of 8-byte xxhash64 urlHashes, never URL strings
    *     (~10x narrower). Membership is hash-exact: a 64-bit collision
    *     would suppress a genuinely-new URL; at streaming-ingest rates this
    *     is ~n²/2^65 per shard. The batch loop's sharded-bloom + EXACT
    *     anti-join remains the 10^10-scale path; this is the
    *     streaming-ingest variant.
    *
    * REQUIRED at scale: the RocksDB state-store provider
    * (spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider), which keeps shards off-heap/on-disk;
    * the default HDFS-backed store materializes values on the executor heap.
    */
  def streamingSeenFilter(spark: SparkSession, urls: Dataset[UrlEvent],
                          bands: Int = 64): Dataset[String] = {
    import spark.implicits._
    urls
      .select(col("host"), col("url"), xxhash64(col("url")).as("urlHash"))
      .as[(String, String, Long)]
      .groupByKey { case (host, _, h) => (host, ((h % bands) + bands) % bands) }
      .flatMapGroupsWithState[Set[Long], String](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (String, Long), rows: Iterator[(String, String, Long)], state: GroupState[Set[Long]]) =>
          val seen = state.getOption.getOrElse(Set.empty[Long])
          val freshHashes = scala.collection.mutable.HashSet[Long]()
          val freshUrls = Vector.newBuilder[String]
          rows.foreach { case (_, url, h) =>
            if (!seen.contains(h) && freshHashes.add(h)) freshUrls += url
          }
          if (freshHashes.nonEmpty) state.update(seen ++ freshHashes)
          freshUrls.result().iterator
      }
  }
}
