package graft

import graft.crawl.{CrawlLoop, SnapshotStore}
import graft.fixtures.Fixtures
import graft.fixtures.Fixtures.FixtureConfig
import graft.model._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.url.UrlFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract (SURVEY.md §2/§5.2.5): one `queries` entry per operator,
  * with a DuckDB-runnable oracle in `oracleSql` wherever the operator is
  * ANSI-SQL-expressible. Column names are aligned pairwise; every float
  * output is rounded identically on both sides; every query ends in a full
  * deterministic ORDER BY.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: a politeness-budgeted, robots-filtered crawl over the
    * deterministic fixture web, returning the structural crawl order.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val fix = FixtureConfig(nHosts = 3, maxPagesPerHost = 10)
    val pages = spark.createDataset(Fixtures.generate(fix)).toDF()
    val robots = spark.createDataset(Seq(
      RobotsRule("h0.test", disallow = Seq("/p/7"), allow = Seq.empty, crawlDelayMs = 0L)))
    val store = new SnapshotStore(
      java.nio.file.Files.createTempDirectory("graft-entry").toString, spark)
    val cfg = CrawlConfig(hostBudget = 4, maxRounds = 4)
    val out = new CrawlLoop(spark, cfg, pages, robots, Map.empty, store).run(Seq(Fixtures.urlOf(0, 0)))
    out.order(spark)
  }

  // shifted twin of documents: guarantees near-dup pairs with known answers
  private def docsWithTwins(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.unionByName(d.withColumn("doc_id", col("doc_id") + 10000L))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2 crawl-operator harness expressions over the TPC-H-ish tables ----
    "q02_fetch_join_inner" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .filter(col("o_orderstatus") === "O")
        .groupBy(col("l_orderkey").as("okey"))
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy(col("okey"))
    }),
    "q02_fetch_join_left" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),
    "q03_link_extract" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy("token")),
    "q04_text_invariant" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).as("len"), col("n_chars"))
        .filter(col("len") === col("n_chars"))
        .orderBy("doc_id")),
    "q05_canonicalize" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(UrlFunctions.canonicalizeAbs(
          concat(lit("HTTP://"), upper(col("source")), lit(".Test:80/A/../b#frag"))).as("curl"))
        .distinct()
        .orderBy("curl")),
    "q06_urlhash" -> ((s, dir) =>
      t(s, dir, "customer").agg(countDistinct(xxhash64(col("c_name"))).as("n"))),
    "q07_filter_pushdown" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000.0)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")),
    "q08_redirect_2hop" -> ((s, dir) => {
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("n_name"), col("r_name")).orderBy("n_name")
    }),
    "q09_dedup_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val big = o.filter(col("o_totalprice") > 300000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    }),
    "q09_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
        .orderBy("l_orderkey", "l_partkey")),
    "q10_politeness_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    }),
    "q11_retry_union" -> ((s, dir) => {
      val e = t(s, dir, "events").filter(col("event_type") === "error")
      e.select(col("event_id"), lit(1).as("attempt"))
        .unionByName(e.filter(col("value") > 0.5).select(col("event_id"), lit(2).as("attempt")))
        .orderBy("event_id", "attempt")
    }),
    "q12_runner_map" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), upper(col("event_type")).as("et"),
          round(col("value") * 2, 4).as("v2"))
        .orderBy("event_id")),
    "q13_result_collect" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(concat_ws(",", sort_array(collect_list(col("o_orderkey")))).as("okeys"))
        .orderBy("o_custkey")),
    "q14_time_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
        .orderBy("hr", "event_type")),
    "q15_topk_sort" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(100)),
    "q16_robots_broadcast" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .filter(exists(array(lit("NATION_1"), lit("NATION_2")), p => col("n_name").startsWith(p)))
        .select("c_custkey", "n_name")
        .orderBy("c_custkey", "n_name")
    }),
    "q17_checkpoint_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
      t(s, dir, "nation").write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp).orderBy("n_nationkey")
    }),
    "q18_agg_tpch_q1" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q19_setops" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val a = n.filter(col("n_regionkey").isin(0, 1)).select("n_nationkey")
      val b = n.filter(col("n_nationkey") < 20).select("n_nationkey")
      val c = n.filter(col("n_regionkey") === 2).select("n_nationkey")
      a.union(b).distinct().except(c).intersect(b).orderBy("n_nationkey")
    }),

    // ---- training-data pipeline operators ----
    "qd_dedup_exact" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.exactDupGroups(d.unionByName(d.withColumn("doc_id", col("doc_id") + 10000L)))
        .orderBy("h")
    }),
    "qd_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashNearDups(docsWithTwins(s, dir), threshold = 0.95)
        .filter(col("b") === col("a") + 10000L)
        .orderBy("a", "b")),
    "qd_dedup_minhash_all" -> ((s, dir) =>
      Dedup.minhashNearDups(docsWithTwins(s, dir), threshold = 0.7)
        .orderBy("a", "b")),
    "qd_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashNearDups(docsWithTwins(s, dir), maxHamming = 3)
        .filter(col("b") === col("a") + 10000L)
        .orderBy("a", "b")),
    "qd_dedup_simhash_all" -> ((s, dir) =>
      Dedup.simhashNearDups(docsWithTwins(s, dir), maxHamming = 3)
        .orderBy("a", "b")),
    "qd_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardNearDups(docsWithTwins(s, dir), threshold = 0.95)
        .filter(col("b") === col("a") + 10000L)
        .orderBy("a", "b")),
    "qd_embed_neardup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val twins = e.unionByName(e.withColumn("vec_id", col("vec_id") + 10000L))
      Similarity.nearDupPairs(twins, dims = 64, threshold = 0.9999).orderBy("a", "b")
    }),
    "qd_knn_brute" -> ((s, dir) =>
      Similarity.bruteForceTopK(t(s, dir, "embeddings"), k = 5)
        .orderBy("id", "rank")),
    "qd_ann_lsh" -> ((s, dir) =>
      // nPlanes sizes buckets to ~n/2^p vectors; 7 planes fits the 500-5000
      // vector testdata (at web scale nPlanes grows ~log2(n))
      Similarity.annTopK(t(s, dir, "embeddings"), dims = 64, k = 5, nPlanes = 7, tables = 8)
        .orderBy("id", "rank")),
    "qd_langid" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")),
    "qd_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(t(s, dir, "documents"))
        .select("doc_id", "n_words", "punct_ratio", "stopword_ratio", "mean_word_len", "quality")
        .orderBy("doc_id")),
    "qd_token_count" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("ws_tokens"),
          TextAnalysis.bpeishTokenCount(col("text")).as("bpeish_tokens"))
        .orderBy("doc_id")),
    "qd_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprintUdf()(col("text")).as("fp"))
        .select(col("doc_id"), size(col("fp")).as("n_fp"),
          element_at(col("fp"), 1).as("fp_min"))
        .orderBy("doc_id")),
    "qm_multimodal_decode" -> ((s, dir) => {
      val media = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.decodeBatch(s, media).toDF().orderBy("doc_id")
    }),
    "qm_frame_sample" -> ((s, dir) => {
      val media = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.frameSamplePlan(Multimodal.decodeBatch(s, media).toDF())
        .select(col("doc_id"), col("n_frames"),
          concat_ws(",", transform(col("sampled_frames"), f => f.cast("string"))).as("frames"))
        .orderBy("doc_id")
    }))

  def oracleSql: Map[String, String] = Map(
    "q02_fetch_join_inner" ->
      """SELECT l_orderkey AS okey, count(*) AS n_items, round(sum(l_extendedprice), 2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'O' GROUP BY 1 ORDER BY 1""",
    "q02_fetch_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q03_link_extract" ->
      """SELECT token, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         GROUP BY 1 ORDER BY 1""",
    "q04_text_invariant" ->
      """SELECT doc_id, length(text) AS len, n_chars FROM documents
         WHERE length(text) = n_chars ORDER BY doc_id""",
    "q05_canonicalize" ->
      """SELECT DISTINCT 'http://' || lower(source) || '.test/b' AS curl
         FROM documents ORDER BY curl""",
    "q06_urlhash" -> "SELECT count(DISTINCT c_name) AS n FROM customer",
    "q07_filter_pushdown" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0 ORDER BY o_orderkey""",
    "q08_redirect_2hop" ->
      """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
         ORDER BY n_name""",
    "q09_dedup_anti" ->
      """SELECT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
         ORDER BY c_custkey""",
    "q09_distinct" ->
      "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem ORDER BY 1, 2",
    "q10_politeness_topk" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q11_retry_union" ->
      """SELECT event_id, 1 AS attempt FROM events WHERE event_type = 'error'
         UNION ALL
         SELECT event_id, 2 AS attempt FROM events WHERE event_type = 'error' AND value > 0.5
         ORDER BY event_id, attempt""",
    "q12_runner_map" ->
      """SELECT event_id, upper(event_type) AS et, round(value * 2, 4) AS v2
         FROM events ORDER BY event_id""",
    "q13_result_collect" ->
      """SELECT o_custkey, array_to_string(list_sort(list(o_orderkey)), ',') AS okeys
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q14_time_window" ->
      """SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n, round(sum(value), 4) AS sv
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q15_topk_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q16_robots_broadcast" ->
      """SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE n_name LIKE 'NATION_1%' OR n_name LIKE 'NATION_2%'
         ORDER BY c_custkey, n_name""",
    "q17_checkpoint_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "q18_agg_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base, count(*) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q19_setops" ->
      """SELECT n_nationkey FROM (
           (SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1)
            UNION
            SELECT n_nationkey FROM nation WHERE n_nationkey < 20)
           EXCEPT
           SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
         WHERE n_nationkey IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 20)
         ORDER BY 1""",
    "qd_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep
         FROM (SELECT * FROM documents UNION ALL SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars FROM documents)
         GROUP BY 1 HAVING count(*) > 1 ORDER BY h""",
    "qd_dedup_minhash" ->
      """SELECT doc_id AS a, doc_id + 10000 AS b, 1.0 AS jaccard
         FROM documents ORDER BY a, b""",
    "qd_dedup_simhash" ->
      """SELECT doc_id AS a, doc_id + 10000 AS b, 0 AS hamming
         FROM documents ORDER BY a, b""",
    "qd_ngram_jaccard" ->
      """SELECT doc_id AS a, doc_id + 10000 AS b, 1.0 AS jaccard
         FROM documents ORDER BY a, b""",
    "qd_embed_neardup" ->
      """SELECT vec_id AS a, vec_id + 10000 AS b, 1.0 AS sim
         FROM embeddings ORDER BY a, b""",
    "qd_token_count" ->
      """SELECT doc_id, length(string_split(trim(text), ' ')) AS ws_tokens,
                length(regexp_extract_all(text, '\w{1,4}|[^\w\s]')) AS bpeish_tokens
         FROM documents ORDER BY doc_id""",
    "qd_quality" ->
      """WITH f AS (
           SELECT doc_id,
                  length(string_split(text, ' ')) AS n_words,
                  floor((length(text) - length(replace(replace(replace(replace(replace(replace(text,'.',''),',',''),';',''),':',''),'!',''),'?',''))) / length(text) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
                  floor(len(list_filter(string_split(lower(text), ' '), w -> w IN ('the','and','of','to','in','a','is','that'))) / length(string_split(text, ' ')) * 10000.0 + 0.5) / 10000.0 AS stopword_ratio,
                  floor((length(text) - length(string_split(text, ' ')) + 1) / length(string_split(text, ' ')) * 10000.0 + 0.5) / 10000.0 AS mean_word_len
           FROM documents)
         SELECT doc_id, n_words, punct_ratio, stopword_ratio, mean_word_len,
                floor((least(1.0, n_words / 64.0) * 0.4
                       + (1.0 - least(1.0, punct_ratio * 5)) * 0.2
                       + least(1.0, stopword_ratio * 4) * 0.2
                       + (1.0 - least(1.0, abs(mean_word_len - 5.0) / 5.0)) * 0.2) * 10000.0 + 0.5) / 10000.0 AS quality
         FROM f ORDER BY doc_id""",
    "qm_multimodal_decode" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
                64 + octet_length(encode(text)) % 64 AS width,
                64 + octet_length(encode(text)) % 37 AS height,
                1 + octet_length(encode(text)) % 8 AS n_frames,
                CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS format
         FROM documents ORDER BY doc_id""",
    "qm_frame_sample" ->
      """SELECT doc_id, 1 + octet_length(encode(text)) % 8 AS n_frames,
                array_to_string(list_filter(range(0, 1 + octet_length(encode(text)) % 8),
                  i -> i % CAST(ceil((1 + octet_length(encode(text)) % 8) / 4.0) AS INT) = 0), ',') AS frames
         FROM documents ORDER BY doc_id""")
}
