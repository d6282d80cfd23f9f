package graft

import graft.crawl.{CrawlLoop, SnapshotStore}
import graft.fixtures.Fixtures
import graft.fixtures.Fixtures.FixtureConfig
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Golden test for the crawlkit-shaped nested results export (SURVEY.md §2
  * #13/#14): {"url":..., "runners": {key: {result|error}}} per URL, runner
  * keys sorted, errors carried under their key.
  */
class ResultsExportSpec extends AnyFunSuite {
  import SparkTestBase.{spark, tmpDir}
  import spark.implicits._

  object OkRunner extends PageRunner {
    def apply(p: Page): Either[String, String] = Right(p.lang)
  }
  object ErrRunner extends PageRunner {
    def apply(p: Page): Either[String, String] = Left("boom")
  }

  test("resultsJson exports the crawlkit nested shape, keys sorted, errors kept") {
    val fix = FixtureConfig(nHosts = 2, maxPagesPerHost = 4, pctRedirect = 0, pctDangling = 0)
    val pages = Fixtures.generate(fix)
    val store = new SnapshotStore(tmpDir("export"), spark)
    val out = new CrawlLoop(spark, CrawlConfig(maxRounds = 3),
      spark.createDataset(pages).toDF(), spark.emptyDataset[RobotsRule],
      Map("zlang" -> OkRunner, "afail" -> ErrRunner), store)
      .run(Seq(Fixtures.urlOf(0, 0)))

    val seed = Fixtures.urlOf(0, 0)
    val lang = pages.find(_.url == seed).get.lang
    val json = out.resultsJson(spark)
      .filter($"url" === seed).select("json").as[String].head()
    assert(json ===
      s"""{"url":"$seed","runners":{"afail":{"error":"boom"},"zlang":{"result":"$lang"}}}""")
    store.clear()
  }
}
