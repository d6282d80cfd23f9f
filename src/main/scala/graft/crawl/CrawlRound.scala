package graft.crawl

import graft.extract.Extract
import graft.filterset.BloomShards
import graft.model._
import graft.robots.Robots
import graft.sched.Politeness
import graft.url.{Policy, UrlFunctions}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One crawl round as one declarative Dataset job (BASELINE.json:6 "each
  * crawl round is a typed Dataset job"). The semantics transcribe the ROUND
  * SPEC in [[graft.ref.ReferenceCrawl]] — the sequential oracle — step for
  * step; parity tests assert exact crawl-order and seen-set equality.
  *
  * Scale shape (SURVEY.md §3.2): at most three shuffles per round — the
  * politeness window, the fetch join (elided into a broadcast-hash join
  * whenever the frontier is small enough), and the dedup anti-join (whose
  * left input the sharded bloom pre-filter thins first). The page store is
  * always the streamed side; discovered-link extraction is pure Catalyst
  * built-ins inside whole-stage codegen.
  */
object CrawlRound {

  val FrontierCols: Seq[String] = Seq("url", "urlHash", "host", "depth", "seq", "attempt")

  final case class RoundOut(
      nextFrontier: DataFrame,
      fresh: DataFrame,
      order: DataFrame,
      results: DataFrame,
      /** (shard, stage, count) raw lineage counts */
      stats: DataFrame,
      persisted: Seq[DataFrame])

  def execute(
      spark: SparkSession,
      cfg: CrawlConfig,
      round: Int,
      frontier: DataFrame,
      frontierCount: Long,
      pages: DataFrame,
      robots: Dataset[RobotsRule],
      robotsEmpty: Boolean,
      seen: DataFrame, // url, urlHash
      bloomDirPrev: Option[String],
      seedHosts: Set[String],
      runners: Map[String, PageRunner]): RoundOut = {
    import spark.implicits._

    val fc = FrontierCols.map(col)
    val f = frontier.select(fc: _*).persist(StorageLevel.MEMORY_AND_DISK)
    val fCount = frontierCount

    // 1-2. robots filter (broadcast join, no shuffle)
    val (allowed, robotsDropped) =
      if (robotsEmpty) (f, f.limit(0)) else Robots.partition(f, robots)

    // 3. per-host politeness budget (host-hash-partitioned PQ, secondary sort)
    val (admitted0, deferred) = Politeness.partition(allowed, cfg)
    val admitted = admitted0.select(fc: _*).persist(StorageLevel.MEMORY_AND_DISK)

    // 4. the "fetch": join against the page store. The store is the big
    // streamed side; the frontier broadcasts when small (BASELINE.json:6).
    val admittedJ = if (fCount <= cfg.broadcastFrontierMaxRows) broadcast(admitted) else admitted
    val hits = pages
      .join(admittedJ, Seq("url"), "inner")
      .select((fc :+ col("warc_ts") :+ col("html") :+ col("text") :+ col("lang")): _*)
      .withColumn("htmlStr", Extract.htmlStrCol(col("html")))
      .withColumn("redir", Extract.redirectTargetCol(col("htmlStr")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val hitUrls = hits.select("url")
    val misses = admitted.join(
      if (fCount <= cfg.broadcastFrontierMaxRows) broadcast(hitUrls) else hitUrls,
      Seq("url"), "left_anti")
    val retries = misses
      .filter(col("attempt") + 1 < cfg.maxTries)
      .withColumn("attempt", col("attempt") + 1)
      .select(fc: _*)
    val exhausted = misses.filter(col("attempt") + 1 >= cfg.maxTries)

    // 5. crawl order rows for every successful fetch
    val order = hits.select(col("url"), lit(round).as("round"), col("depth"), col("seq"))

    // results: fetch errors + redirect records + runner outputs
    val errResults = exhausted.select(col("url"), lit(round).as("round"),
      lit("__fetch__").as("runner"), lit(null).cast("string").as("result"),
      lit("fetch-miss").as("error"))
    val redirResults = hits.filter(col("redir").isNotNull)
      .select(col("url"), lit(round).as("round"), lit("__redirect__").as("runner"),
        col("redir").as("result"), lit(null).cast("string").as("error"))
    val runnerResults: DataFrame =
      if (runners.isEmpty) spark.emptyDataset[RunnerResult].toDF()
      else {
        val rs = runners.toSeq.sortBy(_._1)
        val r = round
        hits.filter(col("redir").isNull)
          .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))
          .as[Page]
          .flatMap { p =>
            rs.map { case (k, fn) =>
              fn(p) match {
                case Right(v)  => RunnerResult(p.url, r, k, Some(v), None)
                case Left(err) => RunnerResult(p.url, r, k, None, Some(err))
              }
            }
          }.toDF()
      }
    val results = errResults.unionByName(redirResults).unionByName(runnerResults)

    // 5b. discovery: Catalyst-planned link extraction (codegen'd built-ins)
    val linkCand = hits
      .filter(col("redir").isNull && lit(cfg.maxDepth) >= col("depth") + 1)
      .select(col("url").as("parentUrl"), col("depth"), col("seq"),
        posexplode(Extract.linksCol(col("htmlStr"))).as(Seq("pos", "href")))
      .withColumn("curl0", UrlFunctions.canonicalize(col("parentUrl"), col("href")))
      .filter(col("curl0").isNotNull)
      .withColumn("curl", Policy.rewriteCol(cfg.rewrite, col("curl0")))
      .withColumn("chost", UrlFunctions.hostOfUdf(col("curl")))
      .filter(Policy.allowsCol(cfg.policy, col("curl"), col("chost"), seedHosts))
      .select(col("curl").as("url"), xxhash64(col("curl")).as("urlHash"),
        col("chost").as("host"), (col("depth") + 1).as("depth"),
        concat(col("seq"), array(col("pos").cast("long"))).as("seq"),
        lit(0).as("attempt"))

    val redirCand =
      if (!cfg.followRedirects) linkCand.limit(0)
      else hits
        .filter(col("redir").isNotNull && lit(cfg.maxDepth) >= col("depth") + 1)
        .withColumn("curl0", UrlFunctions.canonicalize(col("url"), col("redir")))
        .filter(col("curl0").isNotNull)
        .withColumn("curl", Policy.rewriteCol(cfg.rewrite, col("curl0")))
        .withColumn("chost", UrlFunctions.hostOfUdf(col("curl")))
        .filter(Policy.allowsCol(cfg.redirectPolicy, col("curl"), col("chost"), seedHosts))
        .select(col("curl").as("url"), xxhash64(col("curl")).as("urlHash"),
          col("chost").as("host"), (col("depth") + 1).as("depth"),
          concat(col("seq"), array(lit(0L))).as("seq"),
          lit(0).as("attempt"))

    val candidates = linkCand.unionByName(redirCand).persist(StorageLevel.MEMORY_AND_DISK)

    // 6. dedup: within-round winner = min (depth, seq) per url, then the
    // EXACT anti-join vs the seen set; bloom shards pre-filter so rows the
    // filter proves unseen skip the anti-join shuffle entirely.
    val winner = Window.partitionBy(col("url")).orderBy(col("depth"), col("seq"))
    val winnowed = candidates
      .withColumn("__rn", row_number().over(winner))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val fresh0 = bloomDirPrev match {
      case Some(dir) if cfg.bloomPrefilter =>
        val w = winnowed.withColumn("__maybe",
          BloomShards.mightBeSeen(dir)(BloomShards.shardCol(col("urlHash"), cfg.shards), col("urlHash")))
        val definitelyNew = w.filter(!col("__maybe")).select(fc: _*)
        val needExact = w.filter(col("__maybe")).select(fc: _*)
          .join(seen.select("url"), Seq("url"), "left_anti")
        definitelyNew.unionByName(needExact)
      case _ =>
        winnowed.join(seen.select("url"), Seq("url"), "left_anti").select(fc: _*)
    }
    val fresh = fresh0.select(fc: _*).persist(StorageLevel.MEMORY_AND_DISK)

    // 7. next frontier
    val nextFrontier = deferred.select(fc: _*)
      .unionByName(retries)
      .unionByName(fresh)

    // per-shard lineage counts, one aggregation job over persisted inputs
    def tag(df: DataFrame, stage: String): DataFrame =
      df.select(BloomShards.shardCol(col("urlHash"), cfg.shards).as("shard"),
        lit(stage).as("stage"))
    val stats = tag(f, "frontier")
      .unionByName(tag(robotsDropped, "robots_dropped"))
      .unionByName(tag(deferred, "budget_deferred"))
      .unionByName(tag(admitted, "admitted"))
      .unionByName(tag(hits, "fetched"))
      .unionByName(tag(retries, "retries"))
      .unionByName(tag(exhausted, "errors"))
      .unionByName(tag(candidates, "discovered"))
      .unionByName(tag(fresh, "fresh"))
      .groupBy(col("shard"), col("stage")).count()

    RoundOut(nextFrontier, fresh, order, results, stats,
      persisted = Seq(f, admitted, hits, candidates, fresh))
  }
}
