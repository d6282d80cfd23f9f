package graft

import java.sql.Timestamp

import graft.streaming.Streaming
import graft.streaming.Streaming.UrlEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("watermarked tumbling-window counts finalize and drop late rows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = Streaming
      .windowedEventCounts(in.toDF.toDF("ts", "event_type", "value"),
        windowDur = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(1, 10), "click", 1.0), (ts(1, 20), "click", 2.0), (ts(1, 30), "view", 3.0))
      q.processAllAvailable()
      // advance watermark far past hour 1 -> hour-1 windows finalize
      in.addData((ts(5), "click", 1.0))
      q.processAllAvailable()
      // this row is hours late -> dropped by the watermark
      in.addData((ts(1, 40), "click", 99.0))
      q.processAllAvailable()
      in.addData((ts(8), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("w_start", "event_type", "n", "sv")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows.contains((ts(1), "click", 2L, 3.0)), s"got $rows")
      assert(rows.contains((ts(1), "view", 1L, 3.0)))
      assert(!rows.exists { case (w, t, n, sv) => w == ts(1) && t == "click" && sv == 102.0 },
        "late row must have been dropped")
    } finally q.stop()
  }

  test("streaming URL-seen filter emits first occurrences only, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UrlEvent]
    val q = Streaming.streamingSeenFilter(spark, in.toDS())
      .writeStream.format("memory").queryName("seen_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(UrlEvent("h0", "http://h0.test/a"), UrlEvent("h0", "http://h0.test/b"),
        UrlEvent("h0", "http://h0.test/a"), UrlEvent("h1", "http://h1.test/x"))
      q.processAllAvailable()
      // second batch: dups across batches must be suppressed by state
      in.addData(UrlEvent("h0", "http://h0.test/a"), UrlEvent("h0", "http://h0.test/c"),
        UrlEvent("h1", "http://h1.test/x"))
      q.processAllAvailable()
      val out = spark.table("seen_stream").as[String].collect().toList
      assert(out.sorted === List("http://h0.test/a", "http://h0.test/b",
        "http://h0.test/c", "http://h1.test/x"))
    } finally q.stop()
  }

  test("streaming content-dedup emits first occurrence per sha-256 content, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streaming.streamingContentDedup(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cdedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((0L, "alpha beta"), (1L, "gamma delta"))
      q.processAllAvailable()
      // cross-batch duplicate must be suppressed by the content-hash state
      in.addData((2L, "alpha beta"), (3L, "epsilon zeta"))
      q.processAllAvailable()
      val ids = spark.table("cdedup_stream").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(0L, 1L, 3L),
        "one emit per distinct content, first occurrence wins across batches")
    } finally q.stop()
  }

  test("URL-seen filter under the RocksDB state-store provider it requires at scale") {
    // Streaming.scala documents the RocksDB provider as REQUIRED at scale
    // (keeps seen-set shards off-heap/on-disk); this pins that the keyed
    // state actually serializes through it with identical output.
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[UrlEvent]
    val q = Streaming.streamingSeenFilter(spark, in.toDS())
      .writeStream.format("memory").queryName("seen_stream_rocks")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(UrlEvent("h0", "http://h0.test/a"), UrlEvent("h0", "http://h0.test/b"),
        UrlEvent("h1", "http://h1.test/x"))
      q.processAllAvailable()
      in.addData(UrlEvent("h0", "http://h0.test/a"), UrlEvent("h0", "http://h0.test/c"),
        UrlEvent("h1", "http://h1.test/x"), UrlEvent("h1", "http://h1.test/y"))
      q.processAllAvailable()
      val out = spark.table("seen_stream_rocks").as[String].collect().toList
      assert(out.sorted === List("http://h0.test/a", "http://h0.test/b",
        "http://h0.test/c", "http://h1.test/x", "http://h1.test/y"),
        "RocksDB-backed state must produce the identical first-occurrence stream")
      val opProgress = q.recentProgress.flatMap(p => Option(p.stateOperators).toSeq.flatten)
      assert(opProgress.exists(_.numRowsUpdated > 0), "state rows must have flowed through the store")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("SQL-registered custom functions work from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    val dot = spark.sql("SELECT graft_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(dot === 11.0)
    val sig = spark.sql(
      "SELECT size(graft_minhash_sig(graft_shingle_hashes('a b c d e', true, 3), 16, 42L)) AS n")
      .as[Int].head()
    assert(sig === 16)
  }

  test("streaming per-host rate limiter: budget per batch, FIFO carry, loud buffer drops") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UrlEvent]
    val q = Streaming.rateLimitPerHost(spark, in.toDS(), budget = 2, maxBuffer = 2)
      .writeStream.format("memory").queryName("rate_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // 5 urls for h0 in one batch at budget 2, buffer 2: a,b emit;
      // c,d buffer; e overflows the buffer -> loud marker row
      in.addData(Seq("e", "d", "c", "b", "a").map(u => UrlEvent("h0", u)): _*)
      q.processAllAvailable()
      val batch1 = spark.table("rate_stream").as[UrlEvent].collect().toList
      assert(batch1.map(_.url).sorted === List("a", "b", "dropped:e"))
      // next batch mentioning h0 drains the carried queue FIRST (c,d
      // before the new f); h1 has its own independent budget
      in.addData(UrlEvent("h0", "f"), UrlEvent("h1", "x"))
      q.processAllAvailable()
      val all = spark.table("rate_stream").as[UrlEvent].collect().toList
      val h0SecondBatch = all.filter(e => e.host == "h0").map(_.url)
        .filterNot(batch1.map(_.url).contains)
      assert(h0SecondBatch.sorted === List("c", "d"), "carried FIFO queue drains before new urls")
      assert(all.exists(e => e.host == "h1" && e.url == "x"))
      // third batch for h0 emits the remaining f
      in.addData(UrlEvent("h0", "g"))
      q.processAllAvailable()
      val third = spark.table("rate_stream").as[UrlEvent].collect().toList
        .filter(_.host == "h0").map(_.url)
      assert(third.count(_ == "f") === 1 && third.count(_ == "g") === 1)
    } finally q.stop()
  }

  test("robots Sitemap: directives parse globally, dedup, survive comments") {
    val txt =
      """# host robots
        |User-agent: *
        |Disallow: /tmp
        |Sitemap: http://h0.test/sitemap.xml
        |User-agent: bot
        |Allow: /
        |sitemap: http://h0.test/sitemap2.xml   # trailing comment
        |Sitemap: http://h0.test/sitemap.xml
        |Sitemap:
        |""".stripMargin
    assert(graft.robots.Robots.sitemapUrls(txt) ===
      Vector("http://h0.test/sitemap.xml", "http://h0.test/sitemap2.xml"))
    assert(graft.robots.Robots.sitemapUrls(null) === Vector.empty)
    // group parsing is unaffected by interleaved Sitemap lines
    val rule = graft.robots.Robots.parseRobotsTxt("h0.test", txt)
    assert(rule.disallow === Seq("/tmp"))
  }
}
