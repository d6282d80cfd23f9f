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
