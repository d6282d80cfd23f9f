package graft

import graft.extract.Extract
import graft.fixtures.Fixtures
import graft.fixtures.Fixtures.FixtureConfig
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtractSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  test("pure extraction: links in order, redirects, text") {
    val html = """<html><head><title>t</title></head><body><p>a b</p>""" +
      """<a href="x">l0</a><a href="/y">l1</a><a href="#f">l2</a></body></html>"""
    assert(Extract.extractLinks(html) === Vector("x", "/y", "#f"))
    assert(Extract.extractText(html) === "t a b l0 l1 l2")
    val redir = "Location: http://h1.test/p/0"
    assert(Extract.redirectTarget(redir) === Some("http://h1.test/p/0"))
    assert(Extract.extractLinks(redir).isEmpty)
    assert(Extract.extractText(redir) === "")
  }

  test("sitemap locs: pure/Column agree, entries trim, non-loc tags ignored") {
    val xml = "<urlset><url><loc> http://a.test/1 </loc><lastmod>2024-01-01</lastmod></url>" +
      "<url><loc>http://a.test/2</loc></url><url><loc>\thttp://a.test/3\n</loc></url></urlset>"
    val expect = Vector("http://a.test/1", "http://a.test/2", "http://a.test/3")
    assert(Extract.sitemapLocs(xml) === expect)
    val got = Seq(xml).toDF("xml")
      .select(Extract.sitemapLocsCol(col("xml")).as("locs"))
      .as[Seq[String]].head()
    assert(got === expect)
    assert(Extract.sitemapLocs("<urlset></urlset>") === Vector.empty)
  }

  test("sitemap-seeded discovery: robots Sitemap directive -> sitemap page -> loc seeds") {
    val robotsTxt = "User-agent: *\nDisallow: /tmp\nSitemap: http://h0.test/sitemap.xml"
    val fetched = Map("http://h0.test/sitemap.xml" ->
      ("<urlset><url><loc>http://h0.test/p/0</loc></url>" +
        "<url><loc>http://h0.test/p/1</loc></url></urlset>"))
    val seeds = graft.robots.Robots.sitemapUrls(robotsTxt)
      .flatMap(u => fetched.get(u).toVector.flatMap(Extract.sitemapLocs))
    assert(seeds === Vector("http://h0.test/p/0", "http://h0.test/p/1"))
  }

  test("per-row invariant: extractText(html) == text, byte-identical, over the fixture web") {
    val cfg = FixtureConfig(nHosts = 6, maxPagesPerHost = 24)
    val pages = Fixtures.generate(cfg)
    assert(pages.nonEmpty)
    pages.foreach { p =>
      assert(Extract.extractText(Extract.htmlToString(p.html)) === p.text, s"drift at ${p.url}")
    }
  }

  test("Column expressions match the pure functions byte-for-byte on every fixture page") {
    val cfg = FixtureConfig(nHosts = 6, maxPagesPerHost = 24)
    val pages = Fixtures.generate(cfg)
    val df = spark.createDataset(pages).toDF()
      .withColumn("htmlStr", Extract.htmlStrCol(col("html")))
      .select(
        col("url"), col("htmlStr"),
        Extract.textCol(col("htmlStr")).as("colText"),
        Extract.linksCol(col("htmlStr")).as("colLinks"),
        Extract.redirectTargetCol(col("htmlStr")).as("colRedir"),
        col("text"))
      .collect()
    assert(df.length === pages.length)
    df.foreach { r =>
      val htmlStr = r.getString(1)
      assert(r.getString(2) === Extract.extractText(htmlStr), s"text drift at ${r.getString(0)}")
      assert(r.getString(2) === r.getString(5))
      assert(r.getSeq[String](3) === Extract.extractLinks(htmlStr), s"link drift at ${r.getString(0)}")
      assert(Option(r.getString(4)) === Extract.redirectTarget(htmlStr))
    }
  }

  test("redirect target trim: Column ≡ pure on whitespace-tailed targets (Java trim semantics)") {
    // Java String.trim strips all chars <= U+0020; Spark's trim() strips
    // only ' ' — the Column mirror must match the pure spec on \n \t \r
    val bodies = Seq(
      "Location: http://x.test/a\n",
      "Location: http://x.test/a\t\r\n",
      "Location:  http://x.test/a ",
      "Location: \t http://x.test/a")
    val rows = bodies.toDF("htmlStr")
      .select(col("htmlStr"), Extract.redirectTargetCol(col("htmlStr")).as("colRedir"))
      .collect()
    rows.foreach { r =>
      assert(Option(r.getString(1)) === Extract.redirectTarget(r.getString(0)),
        s"trim drift on ${r.getString(0).replace("\n", "\\n")}")
    }
  }

  test("fixture determinism: same config generates identical pages") {
    val cfg = FixtureConfig(nHosts = 3, maxPagesPerHost = 10)
    val a = Fixtures.generate(cfg)
    val b = Fixtures.generate(cfg)
    assert(a.map(_.url) === b.map(_.url))
    assert(a.map(p => new String(p.html, "UTF-8")) === b.map(p => new String(p.html, "UTF-8")))
    // distributed generation matches driver-side generation exactly
    val ds = Fixtures.generateDS(spark, cfg).collect().sortBy(_.url)
    val drv = a.sortBy(_.url)
    assert(ds.map(_.url).toSeq === drv.map(_.url))
    assert(ds.map(_.text).toSeq === drv.map(_.text))
  }
}
