package graft

import graft.crawl.{CrawlLoop, SnapshotStore}
import graft.fixtures.Fixtures
import graft.fixtures.Fixtures.FixtureConfig
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-equivalence property (BASELINE.json:6): a crawl killed after
  * round k and resumed produces the EXACT same crawl order and seen set as
  * an uninterrupted run — without re-fetching committed rounds.
  */
class ResumeSpec extends AnyFunSuite {
  import SparkTestBase.{spark, tmpDir}
  import spark.implicits._

  test("kill after round k + resume ≡ uninterrupted run (order and seen set)") {
    val fix = FixtureConfig(nHosts = 4, maxPagesPerHost = 16)
    val pages = spark.createDataset(Fixtures.generate(fix)).toDF()
    val robots = spark.emptyDataset[RobotsRule]
    val seeds = Seq(Fixtures.urlOf(0, 0))
    val cfgFull = CrawlConfig(hostBudget = 3)

    val storeA = new SnapshotStore(tmpDir("uninterrupted"), spark)
    val full = new CrawlLoop(spark, cfgFull, pages, robots, Map.empty, storeA).run(seeds)
    val fullOrder = full.order(spark).select("url").as[String].collect().toVector
    val fullSeen = full.seen(spark).select("url").as[String].collect().toSet

    val storeB = new SnapshotStore(tmpDir("interrupted"), spark)
    // "kill" after 2 rounds
    val part = new CrawlLoop(spark, cfgFull.copy(maxRounds = 2), pages, robots, Map.empty, storeB).run(seeds)
    assert(part.roundsRun === 2)
    // leave mid-round debris: an uncommitted, unreadable next-round dir
    val debris = new java.io.File(storeB.tablePath("fresh", 99))
    debris.mkdirs()
    java.nio.file.Files.writeString(debris.toPath.resolve("part-garbage.parquet"), "junk")
    // resume to completion
    val resumed = new CrawlLoop(spark, cfgFull, pages, robots, Map.empty, storeB).run(seeds)
    assert(resumed.roundsRun < full.roundsRun, "resume must not re-run committed rounds")

    val resOrder = resumed.order(spark).select("url").as[String].collect().toVector
    val resSeen = resumed.seen(spark).select("url").as[String].collect().toSet
    assert(resOrder === fullOrder, "resumed crawl order diverged")
    assert(resSeen === fullSeen, "resumed seen set diverged")

    // resuming a finished crawl is a no-op with identical outputs
    val again = new CrawlLoop(spark, cfgFull, pages, robots, Map.empty, storeB).run(seeds)
    assert(again.roundsRun === 0)
    assert(again.order(spark).select("url").as[String].collect().toVector === fullOrder)
    storeA.clear(); storeB.clear()
  }

  test("trap feedback survives resume: killed past a trap boundary, the recomputed trap set matches") {
    val fix = FixtureConfig(nHosts = 4, maxPagesPerHost = 16)
    val pages = spark.createDataset(Fixtures.generate(fix)).toDF()
    val robots = spark.emptyDataset[RobotsRule]
    val seeds = Seq(Fixtures.urlOf(0, 0))
    // every fixture host collapses to one pattern; minUrls discriminates
    val cfg = CrawlConfig(policy = UrlPolicy.AllowAll, maxDepth = 6,
      trapDetectEvery = 2, trapMinUrls = 10, trapMinRatioBp = 20000)

    val storeA = new SnapshotStore(tmpDir("trap-full"), spark)
    val full = new CrawlLoop(spark, cfg, pages, robots, Map.empty, storeA).run(seeds)
    val fullOrder = full.order(spark).select("url").as[String].collect().toVector
    val fullSeen = full.seen(spark).select("url").as[String].collect().toSet

    val storeB = new SnapshotStore(tmpDir("trap-interrupted"), spark)
    // kill AFTER the first trap boundary (round 2) so the resumed run must
    // recompute a non-empty trap set from the committed seen snapshots
    new CrawlLoop(spark, cfg.copy(maxRounds = 3), pages, robots, Map.empty, storeB).run(seeds)
    val resumed = new CrawlLoop(spark, cfg, pages, robots, Map.empty, storeB).run(seeds)
    assert(resumed.order(spark).select("url").as[String].collect().toVector === fullOrder,
      "trap-aware resumed crawl order diverged")
    assert(resumed.seen(spark).select("url").as[String].collect().toSet === fullSeen,
      "trap-aware resumed seen set diverged")
    storeA.clear(); storeB.clear()
  }

  test("cold-catalog resume: reattach from files in a fresh session, even with a changed shards config") {
    // The in-memory catalog dies with a JVM; the data and bucket layout do
    // not. One shared SparkContext per test JVM means a literal restart is
    // impossible here, so cold state is produced the equivalent way: DROP
    // the catalog entries (external tables — files stay) and resume through
    // a newSession(), forcing readBucketed/reattach to re-register every
    // bucketed snapshot from disk. The resumer also declares a DIFFERENT
    // cfg.shards: the bucket count persisted in the snapshot metadata (not
    // the caller's config) must drive the exchange-free seen anti-join.
    // bloomPrefilter off: bloom shard files are genuinely tied to the shard
    // count they were written with — a changed-shards resume is only
    // defined for the exact path (the pre-filter is an optimization).
    val fix = FixtureConfig(nHosts = 4, maxPagesPerHost = 16)
    val pagesV = Fixtures.generate(fix)
    val pages = spark.createDataset(pagesV).toDF()
    val robots = spark.emptyDataset[RobotsRule]
    val seeds = Seq(Fixtures.urlOf(0, 0))
    val cfg = CrawlConfig(hostBudget = 3, compactSeenEvery = 1, shards = 4,
      bloomPrefilter = false)

    val full = new CrawlLoop(spark, cfg, pages, robots, Map.empty,
      new SnapshotStore(tmpDir("cold-baseline"), spark)).run(seeds)
    val fullOrder = full.order(spark).select("url").as[String].collect().toVector
    val fullSeen = full.seen(spark).select("url").as[String].collect().toSet

    val root = tmpDir("cold-resume")
    val part = new CrawlLoop(spark, cfg.copy(maxRounds = 2), pages, robots, Map.empty,
      new SnapshotStore(root, spark)).run(seeds)
    assert(part.roundsRun === 2)
    assert(new SnapshotStore(root, spark).latestExisting("seen_all", 2).nonEmpty,
      "precondition: a bucketed seen_all snapshot exists before the cold resume")

    // cold catalog: drop every graft_* catalog entry; external-table files survive
    val suffix = s"_${(root.hashCode & 0x7FFFFFFF).toHexString}"
    spark.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith("graft_") && n.endsWith(suffix))
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))

    val spark2 = spark.newSession()
    val store2 = new SnapshotStore(root, spark2)
    val resumed = new CrawlLoop(spark2, cfg.copy(shards = 16), // changed shard config
      spark2.createDataset(pagesV)(org.apache.spark.sql.Encoders.product[Page]).toDF(),
      spark2.createDataset(Seq.empty[RobotsRule])(org.apache.spark.sql.Encoders.product[RobotsRule]),
      Map.empty, store2).run(seeds)
    assert(resumed.roundsRun > 0 && resumed.roundsRun < full.roundsRun,
      "resume must continue, not re-run committed rounds")
    assert(resumed.order(spark2).select("url").as(org.apache.spark.sql.Encoders.STRING).collect().toVector === fullOrder,
      "cold-catalog resume diverged on crawl order")
    assert(resumed.seen(spark2).select("url").as(org.apache.spark.sql.Encoders.STRING).collect().toSet === fullSeen,
      "cold-catalog resume diverged on the seen set")
    store2.clear()
  }

  test("aggressive seen compaction: resume and the public seen() read the compacted chain") {
    val fix = FixtureConfig(nHosts = 4, maxPagesPerHost = 16)
    val pages = spark.createDataset(Fixtures.generate(fix)).toDF()
    val robots = spark.emptyDataset[RobotsRule]
    val seeds = Seq(Fixtures.urlOf(0, 0))
    // compact EVERY round: the seen anti-joins and CrawlOutcome.seen must
    // route through the bucketed seen_all base rather than per-round deltas
    val cfg = CrawlConfig(hostBudget = 3, compactSeenEvery = 1)

    val plain = new CrawlLoop(spark, CrawlConfig(hostBudget = 3), pages, robots, Map.empty,
      new SnapshotStore(tmpDir("nocompact"), spark)).run(seeds)
    val expOrder = plain.order(spark).select("url").as[String].collect().toVector
    val expSeen = plain.seen(spark).select("url").as[String].collect().toSet

    val store = new SnapshotStore(tmpDir("compact-every"), spark)
    val part = new CrawlLoop(spark, cfg.copy(maxRounds = 2), pages, robots, Map.empty, store).run(seeds)
    assert(part.roundsRun === 2)
    val resumed = new CrawlLoop(spark, cfg, pages, robots, Map.empty, store).run(seeds)
    assert(resumed.order(spark).select("url").as[String].collect().toVector === expOrder,
      "compaction must not change crawl order across resume")
    assert(resumed.seen(spark).select("url").as[String].collect().toSet === expSeen,
      "public seen() through the compacted chain must equal the plain union")
    // the compacted base actually exists and is what seen() fans in from
    assert(store.latestExisting("seen_all", resumed.lastRound + 1).nonEmpty,
      "aggressive compaction must have produced a seen_all snapshot")
    store.clear()
  }
}
