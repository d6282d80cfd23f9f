package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.sql.Timestamp

import graft.extract.Extract
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingestion — the on-disk format of
  * Common-Crawl crawls, i.e. the real-world source of the engine's
  * "Common-Crawl-style pages" input table (BASELINE.json:15). Pure-JVM
  * stream parser; no external library.
  *
  * Scale shape: WARC files are read ONE TASK PER FILE — gzip members are
  * not splittable, and Common Crawl ships each crawl as tens of thousands
  * of ~1 GB `.warc.gz` files, so file-level parallelism is the intended
  * (and the industry-standard) distribution axis. Records stream through
  * the parser; a file is never materialized whole. Per-record gzip
  * members concatenated into one file (exactly Common Crawl's layout) are
  * handled transparently: `GZIPInputStream` reads multi-member streams.
  *
  * Pipeline: `readRecords` → [[toPages]] (response records → the Page
  * table shape, text extracted by the same [[Extract]] spec the crawl
  * uses) → [[graft.crawl.PageStore.prepareBucketed]] (collapse multiple
  * captures per URL, bucket by urlHash) → the fetch join.
  */
object Warc {

  final case class WarcRecord(
      source_file: String,
      warc_type: String,
      /** WARC-Target-URI ("" for records without one, e.g. warcinfo) */
      url: String,
      /** WARC-Date */
      warc_ts: Timestamp,
      content_type: String,
      /** raw record block — for response records: HTTP headers + body */
      payload: Array[Byte])

  /** Read every WARC record under `path` (plain or gzip, including
    * concatenated per-record gzip members). Parallelism = one task per
    * file; pass a glob over many files for distribution.
    *
    * `lenient = false` (default) fails the task loudly on a malformed or
    * truncated record. `lenient = true` keeps every complete record and
    * stops at the first corruption in a file with a stderr warning — the
    * warcio-style posture for real crawl archives, whose tails are
    * sometimes cut by the archiving process itself. Choose per pipeline:
    * loud for curated inputs, lenient for raw crawl drops.
    */
  def readRecords(spark: SparkSession, path: String, minPartitions: Int = 0,
                  lenient: Boolean = false): Dataset[WarcRecord] = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(path, mp)
      .flatMap { case (file, pds) =>
        val raw = pds.open()
        val is: InputStream =
          if (file.endsWith(".gz"))
            new java.util.zip.GZIPInputStream(new BufferedInputStream(raw, 1 << 16), 1 << 16)
          else new BufferedInputStream(raw, 1 << 16)
        new WarcIterator(file, is, lenient)
      }
      .toDS()
  }

  /** HTTP-response payload → body bytes (strip the status line + headers at
    * the first CRLFCRLF; payloads without one pass through unchanged)
    */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      i += 1
    }
    payload
  }

  private val httpBodyUdf = udf(httpBody _)

  /** WARC response records → the engine's Page table shape
    * (url, warc_ts, html, text, lang). Text derives from the html via the
    * SAME [[Extract]] spec the crawl's invariant tests pin; lang via the
    * n-gram heuristic. Multiple captures per URL survive here by design —
    * collapse with [[graft.crawl.PageStore.prepareBucketed]] (or
    * latestCapture) before joining, as the CrawlLoop precondition requires.
    */
  def toPages(records: Dataset[WarcRecord]): DataFrame =
    records.toDF()
      .filter(col("warc_type") === "response" && col("url") =!= "")
      .select(col("url"), col("warc_ts"), httpBodyUdf(col("payload")).as("html"))
      .withColumn("text", Extract.textCol(decode(col("html"), "UTF-8")))
      .withColumn("lang", graft.ops.TextAnalysis.langId(col("text")))

  /** Streaming one-pass WARC record parser over one (possibly multi-member
    * gzip) stream. Header lines are ASCII per spec; the payload block is
    * sized by Content-Length, never scanned for delimiters.
    */
  private final class WarcIterator(file: String, is: InputStream, lenient: Boolean)
      extends Iterator[WarcRecord] {

    private var nextRec: WarcRecord = _
    private var done = false

    private def readLine(): String = {
      var c = is.read()
      if (c < 0) return null
      val sb = new java.lang.StringBuilder(64)
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = is.read()
      }
      sb.toString
    }

    private def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = is.read(buf, off, n - off)
        if (r < 0) throw new EOFException(s"$file: truncated WARC payload ($off/$n bytes)")
        off += r
      }
      buf
    }

    private def advance(): Unit = {
      var line = readLine()
      while (line != null && line.isEmpty) line = readLine()
      if (line == null) { done = true; is.close(); return }
      require(line.startsWith("WARC/"),
        s"$file: expected a WARC version line, got '${line.take(40)}'")
      val headers = scala.collection.mutable.HashMap[String, String]()
      var h = readLine()
      while (h != null && h.nonEmpty) {
        val i = h.indexOf(':')
        if (i > 0) headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
        h = readLine()
      }
      val len = headers.get("content-length") match {
        case Some(l) => l.toInt
        case None => throw new IllegalArgumentException(s"$file: WARC record without Content-Length")
      }
      val payload = readFully(len)
      val ts = headers.get("warc-date")
        .map(d => Timestamp.from(java.time.Instant.parse(d)))
        .getOrElse(new Timestamp(0L))
      // some writers wrap the URI in angle brackets (WARC 1.0 §5.2)
      val uri = headers.getOrElse("warc-target-uri", "") match {
        case u if u.length >= 2 && u.head == '<' && u.last == '>' => u.substring(1, u.length - 1)
        case u => u
      }
      nextRec = WarcRecord(file, headers.getOrElse("warc-type", ""), uri, ts,
        headers.getOrElse("content-type", ""), payload)
    }

    override def hasNext: Boolean = {
      if (!done && nextRec == null) {
        if (lenient) {
          try advance()
          catch {
            // EOFException (truncated payload), ZipException (cut gzip
            // member), require() failures on garbage headers
            case e @ (_: java.io.IOException | _: IllegalArgumentException) =>
              System.err.println(s"WARN Warc: stopping at corrupt record in $file " +
                s"(lenient mode; remaining bytes skipped): ${e.getMessage}")
              done = true
              nextRec = null
              try is.close() catch { case _: java.io.IOException => () }
          }
        } else advance()
      }
      !done
    }

    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException(file)
      val r = nextRec
      nextRec = null
      r
    }
  }
}
