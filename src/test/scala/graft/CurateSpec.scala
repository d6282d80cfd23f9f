package graft

import graft.ops.Curate
import graft.ops.Curate.CurateConfig
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The end-to-end corpus-curation composition: annotate → filter (lang /
  * quality / tokens) → exact+near dedup, with the no-silent-row-loss audit
  * contract — every input doc gets exactly one verdict.
  */
class CurateSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private val good = "the cat sat on the mat and it was happy because the sun " +
    "was warm and the garden was quiet in the morning light for hours today"
  private val nearGood = good.dropRight(5) + "night" // last word swapped
  private val german = "der hund und die katze sind nicht auf der couch und das " +
    "haus ist mit einem garten und die sonne ist warm heute morgen hier"
  private val short_ = "the of"
  private val junky = "the.,;:!? and.,;:!? of.,;:!? to.,;:!? in.,;:!? is.,;:!?"
  private val other = "one two three four five the and of to in a quick brown fox " +
    "jumps over lazy dogs while seven eight nine ten eleven twelve thirteen"

  test("curate: filter verdicts, dedup verdicts, and the exact-once audit contract") {
    val docs = Seq(
      (0L, good), // kept
      (1L, good), // exact duplicate of 0
      (2L, nearGood), // near duplicate of 0
      (3L, german), // dropped: lang
      (4L, short_), // dropped: tokens (en, decent quality, too short)
      (5L, junky), // dropped: quality (en, punct-heavy)
      (6L, other)) // kept
      .toDF("doc_id", "text")
    val (curated, audit) = Curate.curate(docs, CurateConfig(langs = Seq("en")))

    val verdicts = audit.collect()
      .map(r => r.getLong(0) -> (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(verdicts.keySet === (0L to 6L).toSet, "every input doc is audited exactly once")
    assert(verdicts(0L) === ("kept", -1L))
    assert(verdicts(1L) === ("duplicate", 0L))
    assert(verdicts(2L) === ("duplicate", 0L))
    assert(verdicts(3L)._1 === "lang")
    assert(verdicts(4L)._1 === "tokens")
    assert(verdicts(5L)._1 === "quality")
    assert(verdicts(6L) === ("kept", -1L))

    val keptIds = curated.select("doc_id").as[Long].collect().sorted
    assert(keptIds === Array(0L, 6L))
    // curated carries the annotations a downstream trainer wants
    for (c <- Seq("lang_pred", "quality", "ws_tokens"))
      assert(curated.columns.contains(c), s"curated output must carry $c")
    // the funnel report is one aggregate over the audit
    val funnel = audit.groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel === Map("kept" -> 2L, "duplicate" -> 2L, "lang" -> 1L,
      "tokens" -> 1L, "quality" -> 1L))
    graft.ops.OpCaches.releaseAll()
  }

  test("packShards: greedy token-budget packing, invariant under partition count") {
    // 6 docs of 4 tokens each, budget 10: start offsets 0,4,8,12,16,20 ->
    // shards 0,0,0,1,1,2
    val docs = (0L to 5L).map(i => (i, "tok tok tok tok")).toDF("doc_id", "text")
    val expected = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 2L))
    for (parts <- Seq(1, 3, 7)) {
      val out = Curate.packShards(docs, tokensPerShard = 10, partitions = parts)
        .select("doc_id", "shard").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(out === expected, s"partitions=$parts must not change the packing")
      graft.ops.OpCaches.releaseAll()
    }
    // an oversized doc overflows its own shard; the next doc starts fresh
    val big = Seq((0L, ("t " * 25).trim), (1L, "a b c")).toDF("doc_id", "text")
    val out2 = Curate.packShards(big, tokensPerShard = 10, partitions = 2)
      .select("doc_id", "shard").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out2 === Seq((0L, 0L), (1L, 2L)),
      "doc 0 spans shards 0-2 by size; doc 1 starts at offset 25 -> shard 2")
    graft.ops.OpCaches.releaseAll()
  }

  test("writeShards: shard=-partitioned parquet round-trips; manifest matches the plan") {
    val docs = (0L to 5L).map(i => (i, "tok tok tok tok")).toDF("doc_id", "text")
    val packed = Curate.packShards(docs, tokensPerShard = 10)
    val dir = SparkTestBase.tmpDir("write-shards")
    val manifest = Curate.writeShards(docs, packed, dir)
      .orderBy("shard").as[(Long, Long, Long)].collect().toSeq
    // 0,4,8 -> shard 0; 12,16 -> shard 1; 20 -> shard 2 (4 tokens each)
    assert(manifest === Seq((0L, 3L, 12L), (1L, 2L, 8L), (2L, 1L, 4L)),
      "read-back manifest must reflect the packing")
    // the written table round-trips every doc with its text intact, and the
    // directory layout is one shard= partition per shard
    val back = spark.read.parquet(dir)
    assert(back.count() === 6L)
    assert(back.select("doc_id", "text").as[(Long, String)].collect().toSet ===
      (0L to 5L).map(i => (i, "tok tok tok tok")).toSet)
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("shard=")) === 3)
    graft.ops.OpCaches.releaseAll()
  }

  test("degenerate inputs: all-filtered corpus and empty packing input stay well-formed") {
    // every doc fails the language filter -> dedup runs on an empty frame;
    // the audit must still cover every input with its filter verdict
    val docs = Seq((0L, german), (1L, german + " zz")).toDF("doc_id", "text")
    val (curated, audit) = Curate.curate(docs, CurateConfig(langs = Seq("en")))
    assert(curated.count() === 0L)
    val verdicts = audit.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(verdicts === Map(0L -> "lang", 1L -> "lang"))
    graft.ops.OpCaches.releaseAll()

    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curate.packShards(empty, tokensPerShard = 10).count() === 0L)
    graft.ops.OpCaches.releaseAll()
  }

  test("sampleByHash: deterministic across partitionings, monotone in rate, exact at the ends") {
    val docs = (0L until 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val at25 = Curate.sampleByHash(docs, rateBp = 2500).select("doc_id")
      .as[Long].collect().toSet
    val at25Repart = Curate.sampleByHash(docs.repartition(7), rateBp = 2500)
      .select("doc_id").as[Long].collect().toSet
    assert(at25 === at25Repart, "same ids survive at any partitioning")
    assert(at25.size > 40 && at25.size < 160, s"~25% of 400 expected, got ${at25.size}")
    val at50 = Curate.sampleByHash(docs, rateBp = 5000).select("doc_id")
      .as[Long].collect().toSet
    assert(at25.subsetOf(at50), "rate increase only ADDS ids (nested samples)")
    assert(Curate.sampleByHash(docs, rateBp = 0).count() === 0L)
    assert(Curate.sampleByHash(docs, rateBp = 10000).count() === 400L)
    // a different salt draws a different (deterministic) sample
    val other = Curate.sampleByHash(docs, rateBp = 2500, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(other !== at25)
  }

  test("capPerDomain: at most k per domain, small domains intact, pick is partition-invariant") {
    val docs = ((0L until 50L).map(i => (i, "big.example")) ++
      (50L until 53L).map(i => (i, "small.example")))
      .toDF("doc_id", "source")
    val capped = Curate.capPerDomain(docs, k = 10)
    val bySrc = capped.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("big.example") === 10L)
    assert(bySrc("small.example") === 3L, "domains under the cap keep every doc")
    val ids1 = capped.select("doc_id").as[Long].collect().toSet
    val ids2 = Curate.capPerDomain(docs.repartition(5), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 === ids2, "seeded-hash pick is independent of partitioning")
    // the survivors are a hash-ordered sample, not the first k by id
    assert(ids1.filter(_ < 50L) !== (0L until 10L).toSet)
  }

  test("curate with empty language allowlist keeps all languages") {
    val docs = Seq((0L, good), (1L, german)).toDF("doc_id", "text")
    val (curated, audit) = Curate.curate(docs, CurateConfig(langs = Seq.empty))
    assert(curated.count() === 2L)
    assert(audit.filter(col("verdict") === "kept").count() === 2L)
    graft.ops.OpCaches.releaseAll()
  }

  test("hostLedger: hand-computed shares, both flag branches, flag thresholds inclusive") {
    val docs = Seq(
      (0L, "aaa bbb ccc", "h1", 50L), // short, duplicated below
      (1L, "aaa bbb ccc", "h1", 50L),
      (2L, "ddd eee fff ggg", "h1", 200L),
      (3L, "unique text here", "h2", 200L),
      (4L, "another unique body", "h2", 200L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val r = Curate.hostLedger(docs, dupFlagBp = 3400L, shortFlagBp = 5000L)
      .orderBy("source")
      .select("source", "n_docs", "n_texts", "dup_docs", "max_copies",
        "total_tokens", "short_docs", "dup_share_bp", "short_share_bp", "flagged")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    // h1: 3 docs over 2 bodies -> dup_share 3333 (< 3400, dup branch NOT
    // tripped), 2 short docs -> short_share 6666 >= 5000 -> flagged
    assert(r(0) === (("h1", 3L, 2L, 1L, 2L, 10L, 2L, 3333L, 6666L, 1L)))
    // h2: clean host
    assert(r(1) === (("h2", 2L, 2L, 0L, 1L, 6L, 0L, 0L, 0L, 0L)))
    // inclusive threshold: dup branch alone flags at exactly its bp value
    val dupOnly = Curate.hostLedger(docs, dupFlagBp = 3333L, shortFlagBp = 10000L)
      .filter(col("source") === "h1").select("flagged").as[Long].head()
    assert(dupOnly === 1L)
  }

  test("incremental ledger: merged per-batch body counts equal the whole-corpus ledger") {
    val batchA = Seq(
      (0L, "aaa bbb ccc", "h1", 50L),
      (2L, "ddd eee fff ggg", "h1", 200L),
      (3L, "unique text here", "h2", 200L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val batchB = Seq(
      (1L, "aaa bbb ccc", "h1", 50L), // dup of a batch-A body, OTHER batch
      (4L, "another unique body", "h2", 200L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val whole = Curate.hostLedger(batchA.unionByName(batchB)).orderBy("source")
    val merged = Curate.hostLedgerOfBodies(Curate.mergeBodyCounts(Seq(
      Curate.bodyCounts(batchA), Curate.bodyCounts(batchB)))).orderBy("source")
    assert(merged.collect().toSeq === whole.collect().toSeq,
      "merge of per-batch states must be indistinguishable from a full recompute")
    // cross-batch dup visible only after the merge: h1 max_copies = 2
    assert(merged.filter(col("source") === "h1").select("max_copies").as[Long].head() === 2L)
  }
}
