package graft

import graft.filterset.BloomShards
import graft.model.CrawlConfig
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bloom pre-filter's "definitely unseen" answer gates the exact
  * anti-join — a false negative (a seen hash probing as unseen) would
  * re-crawl a URL, violating the exactness contract. This pins the
  * ZERO-false-negative invariant across rounds, including shards carried
  * forward by reference in the shard map (never rewritten after round 0).
  */
class BloomShardsSpec extends AnyFunSuite {
  import SparkTestBase.{spark, tmpDir}
  import spark.implicits._

  test("no false negatives across update rounds; untouched shards carry forward by reference") {
    val cfg = CrawlConfig(shards = 4, bloomExpectedPerShard = 1024)
    val root = tmpDir("bloom-shards")
    def dir(r: Int) = s"$root/round=$r"
    def hashesDf(hs: Seq[Long]) = hs.toDF("urlHash")
      .select(BloomShards.shardCol(col("urlHash"), cfg.shards).as("shard"), col("urlHash"))

    // round 0: hashes covering every shard
    val r0 = (0L until 64L)
    BloomShards.update(spark, hashesDf(r0), None, dir(0), cfg)
    // round 1: only shard 0 touched (multiples of 4 hash to shard 0)
    val r1 = (100L until 120L).map(_ * 4)
    BloomShards.update(spark, hashesDf(r1), Some(dir(0)), dir(1), cfg)
    // round 2: only shard 1 touched
    val r2 = (200L until 220L).map(_ * 4 + 1)
    BloomShards.update(spark, hashesDf(r2), Some(dir(1)), dir(2), cfg)

    // probing the LATEST dir must see every hash ever inserted — including
    // round-0 hashes whose shards were never rewritten since
    val all = (r0 ++ r1 ++ r2).toDF("urlHash")
    val missed = all.filter(!BloomShards.mightBeSeen(dir(2))(
      BloomShards.shardCol(col("urlHash"), cfg.shards), col("urlHash"))).count()
    assert(missed === 0L, "bloom must NEVER answer 'definitely unseen' for an inserted hash")

    // and a never-inserted hash in an untouched shard still answers unseen
    val fresh = Seq(999999999L * 4 + 2).toDF("urlHash")
    val falsePos = fresh.filter(BloomShards.mightBeSeen(dir(2))(
      BloomShards.shardCol(col("urlHash"), cfg.shards), col("urlHash"))).count()
    assert(falsePos === 0L, "fresh hash should (at this FPR) probe unseen")
  }

  test("legacy untagged shard files (pre-tag bf.writeTo format) load via version detection") {
    val cfg = CrawlConfig(shards = 2, bloomExpectedPerShard = 1024)
    val legacyDir = tmpDir("bloom-legacy")
    // hand-write shard 0 the way the pre-tag code did: BloomFilter.writeTo
    // directly, stream starting with the version int 0x00000001 — no tag
    // byte, no _shards.json (the bootstrap layout)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1024, 0.01)
    val legacyHashes = (0L until 50L).map(_ * 2) // shard 0 under pmod(h, 2)
    legacyHashes.foreach(bf.putLong)
    val f = new java.io.File(s"$legacyDir/shard_0.bf")
    f.getParentFile.mkdirs()
    val os = new java.io.FileOutputStream(f)
    try bf.writeTo(os) finally os.close()

    // probe path: every legacy hash must answer maybe-seen
    val missed = legacyHashes.toDF("urlHash")
      .filter(!BloomShards.mightBeSeen(legacyDir)(
        BloomShards.shardCol(col("urlHash"), cfg.shards), col("urlHash"))).count()
    assert(missed === 0L, "legacy untagged shard must load, not misparse")

    // resume path: folding new hashes into the legacy dir keeps old + new
    val newHashes = (500L until 520L).map(_ * 2)
    val next = tmpDir("bloom-legacy-next")
    BloomShards.update(spark,
      newHashes.toDF("urlHash")
        .select(BloomShards.shardCol(col("urlHash"), cfg.shards).as("shard"), col("urlHash")),
      Some(legacyDir), next, cfg)
    val missedAfter = (legacyHashes ++ newHashes).toDF("urlHash")
      .filter(!BloomShards.mightBeSeen(next)(
        BloomShards.shardCol(col("urlHash"), cfg.shards), col("urlHash"))).count()
    assert(missedAfter === 0L, "resume from a legacy store must preserve its hashes")
  }
}
