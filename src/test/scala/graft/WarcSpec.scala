package graft

import graft.extract.Extract
import graft.sources.Warc
import org.scalatest.funsuite.AnyFunSuite

/** WARC ingestion golden tests: hand-built WARC files (plain and
  * Common-Crawl-style concatenated per-record gzip members) parsed back to
  * records, and response records mapped to the Page table shape with the
  * engine's own extraction spec.
  */
class WarcSpec extends AnyFunSuite {
  import SparkTestBase.{spark, tmpDir}

  private def http(html: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html).getBytes("UTF-8")

  private def record(typ: String, uri: Option[String], date: String,
                     payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $typ\r\n"
    uri.foreach(u => h ++= s"WARC-Target-URI: $u\r\n")
    h ++= s"WARC-Date: $date\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n"
    h ++= "Content-Type: application/http; msgtype=response\r\n"
    h ++= "\r\n"
    h.toString.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private val htmlA = """<html><body>the quick fox <a href="/b">b</a></body></html>"""
  private val htmlB = """<html><body>und der baum ist <a href="http://h1.test/c">c</a></body></html>"""

  private def warcBytes: Seq[Array[Byte]] = Seq(
    record("warcinfo", None, "2026-01-01T00:00:00Z", "software: graft-test\r\n".getBytes("UTF-8")),
    record("response", Some("http://h0.test/a"), "2026-01-02T03:04:05Z", http(htmlA)),
    // angle-bracket URI form (WARC 1.0 §5.2) must be unwrapped
    record("response", Some("<http://h1.test/b>"), "2026-01-02T03:04:06Z", http(htmlB)))

  test("plain WARC file parses to records with urls, timestamps, payloads") {
    val dir = tmpDir("warc-plain")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/test.warc"),
      warcBytes.reduce(_ ++ _))
    val recs = Warc.readRecords(spark, dir).collect().sortBy(_.url)
    assert(recs.length === 3)
    assert(recs.map(_.warc_type).sorted.toSeq === Seq("response", "response", "warcinfo"))
    val a = recs.find(_.url == "http://h0.test/a").get
    assert(a.warc_ts === java.sql.Timestamp.from(java.time.Instant.parse("2026-01-02T03:04:05Z")))
    assert(new String(a.payload, "UTF-8").endsWith(htmlA))
    assert(recs.exists(_.url == "http://h1.test/b"), "angle-bracket URI must be unwrapped")
  }

  test("concatenated per-record gzip members (the Common-Crawl layout) stream transparently") {
    val dir = tmpDir("warc-gz")
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    // each record gzipped SEPARATELY, members concatenated into one file
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/test.warc.gz"),
      warcBytes.map(gz).reduce(_ ++ _))
    val recs = Warc.readRecords(spark, dir).collect()
    assert(recs.length === 3)
    assert(recs.count(_.warc_type == "response") === 2)
  }

  test("truncated archive: loud by default, lenient keeps complete records") {
    val dir = tmpDir("warc-trunc")
    val full = warcBytes.reduce(_ ++ _)
    // cut the file mid-way through the LAST record's payload
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/trunc.warc"),
      full.take(full.length - 40))
    intercept[org.apache.spark.SparkException] {
      Warc.readRecords(spark, dir).collect()
    }
    val recs = Warc.readRecords(spark, dir, lenient = true).collect()
    assert(recs.length === 2, "lenient mode keeps every record before the corruption")
    assert(recs.exists(_.url == "http://h0.test/a"))
  }

  test("toPages: response records -> Page shape with the engine's extraction spec") {
    val dir = tmpDir("warc-pages")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/test.warc"),
      warcBytes.reduce(_ ++ _))
    val pages = Warc.toPages(Warc.readRecords(spark, dir))
    assert(pages.columns.toSeq === Seq("url", "warc_ts", "html", "text", "lang"))
    val rows = pages.collect().map(r => (r.getString(0),
      new String(r.getAs[Array[Byte]]("html"), "UTF-8"), r.getString(3), r.getString(4)))
      .sortBy(_._1)
    assert(rows.length === 2, "warcinfo must be filtered out")
    val (urlA, bodyA, textA, langA) = rows(0)
    assert(urlA === "http://h0.test/a")
    assert(bodyA === htmlA, "html must be the HTTP body, headers stripped")
    assert(textA === Extract.extractText(htmlA), "text must match the crawl's extraction spec")
    assert(langA === "en")
    assert(rows(1)._4 === "de", "langid flows through toPages")

    // and the result feeds the bucketed page store directly
    val store = graft.crawl.PageStore.prepareBucketed(
      spark, pages, "t_warc_pages_spec", 2, tmpDir("warc-store"))
    assert(store.count() === 2)
  }
}
