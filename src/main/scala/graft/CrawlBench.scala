package graft

import graft.crawl.{CrawlLoop, SnapshotStore}
import graft.fixtures.Fixtures
import graft.fixtures.Fixtures.FixtureConfig
import graft.model._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Crawl-throughput benchmark (BASELINE.md): runs the full frontier loop
  * over a distributed-generated synthetic page store and reports
  * URLs-fetched+deduped/sec. The north rule's two-cluster-size scaling
  * criterion is evidenced by running THIS SAME job at two parallelism
  * levels (SPARK_GRAFT_CPUS=8 vs 32) on the same parquet input — no real
  * cluster exists in the sandbox (SURVEY.md §6).
  *
  * Usage: runMain graft.CrawlBench [nHosts] [maxPagesPerHost] [linksPerPage] [maxRounds] [budget]
  * Emits one JSON line: {"bench":"crawl","cpus":N,"pages":P,"fetched":F,
  * "discovered":D,"wall_sec":W,"throughput":(F+D)/W,...}
  */
object CrawlBench {
  def main(args: Array[String]): Unit = {
    val nHosts = args.lift(0).map(_.toInt).getOrElse(64)
    val maxPages = args.lift(1).map(_.toInt).getOrElse(100000)
    val links = args.lift(2).map(_.toInt).getOrElse(8)
    val maxRounds = args.lift(3).map(_.toInt).getOrElse(8)
    val budget = args.lift(4).map(_.toInt).getOrElse(maxPages)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-crawl-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val fix = FixtureConfig(nHosts = nHosts, maxPagesPerHost = maxPages,
      linksPerPage = links, pctCrossDomain = 20, pctRedirect = 4, pctDangling = 4)
    // materialize the page store ONCE per shape; both parallelism levels read
    // the same parquet input (driver instruction: same input, two core counts)
    val pagesDir = s"/tmp/graft-bench/pages_h${nHosts}_p${maxPages}_l$links"
    if (!new java.io.File(s"$pagesDir/_SUCCESS").exists()) {
      Fixtures.generateDS(spark, fix).toDF()
        .repartition(64, col("url"))
        .write.mode("overwrite").parquet(pagesDir)
    }
    val pages = spark.read.parquet(pagesDir)
    val nPages = fix.totalPages

    val storeDir = java.nio.file.Files.createTempDirectory(s"crawl-bench-$cpus").toString
    val store = new SnapshotStore(storeDir, spark)
    val cfg = CrawlConfig(
      policy = UrlPolicy.AllowAll,
      hostBudget = budget,
      maxRounds = maxRounds,
      shards = cpus.toInt,
      bloomExpectedPerShard = math.max(1L << 16, 4L * nPages / cpus.toInt))
    val seeds = (0 until nHosts).map(h => Fixtures.urlOf(h, 0L))
    val loop = new CrawlLoop(spark, cfg, pages, spark.emptyDataset[RobotsRule], Map.empty, store)

    val t0 = System.nanoTime()
    val out = loop.run(seeds)
    val wall = (System.nanoTime() - t0) / 1e9

    val lin = out.lineage(spark)
      .agg(sum("fetched"), sum("discovered"), sum("dedupDropped"), sum("errors"), sum("retries"))
      .collect()(0)
    val fetched = lin.getLong(0); val discovered = lin.getLong(1)
    val deduped = lin.getLong(2); val errors = lin.getLong(3); val retries = lin.getLong(4)
    val thr = (fetched + discovered) / wall
    println(s"""{"bench":"crawl","cpus":$cpus,"pages":$nPages,"rounds":${out.roundsRun},""" +
      s""""fetched":$fetched,"discovered":$discovered,"deduped":$deduped,"errors":$errors,""" +
      s""""retries":$retries,"wall_sec":${f"$wall%.2f"},"throughput_urls_per_sec":${f"$thr%.1f"}}""")
    store.clear()
    spark.stop()
  }
}
