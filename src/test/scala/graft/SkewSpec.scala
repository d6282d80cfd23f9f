package graft

import java.util.concurrent.atomic.AtomicLong

import graft.model.CrawlConfig
import graft.sched.Politeness
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-handling evidence (SURVEY.md §7.7, BASELINE.json:6 "salted
  * repartition for skewed mega-hosts"): task-level proof that a Zipf
  * mega-host cannot serialize the politeness ranking into one straggler
  * task, and that AQE splits a skewed LSH band join.
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  /** max shuffle-read records any single task saw while running `body` */
  private def maxTaskShuffleRows(body: => Unit): Long = {
    val maxRows = new AtomicLong(0)
    val l = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) maxRows.getAndUpdate(v => math.max(v, m.shuffleReadMetrics.recordsRead))
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(500) } // let the listener bus drain
    finally spark.sparkContext.removeSparkListener(l)
    maxRows.get()
  }

  private val megaRows = 40000
  private def skewedFrontier = {
    // host h0 owns ~95% of the frontier (Zipf head); a handful of tail hosts
    val mega = spark.range(megaRows).select(
      concat(lit("http://h0.test/p/"), col("id")).as("url"),
      xxhash64(concat(lit("http://h0.test/p/"), col("id"))).as("urlHash"),
      lit("h0.test").as("host"), lit(1).as("depth"),
      lit(0L).as("pord"), col("id").as("pos"), lit(0).as("attempt"))
    val tail = spark.range(2000).select(
      concat(lit("http://h"), col("id") % 4 + 1, lit(".test/p/"), col("id")).as("url"),
      xxhash64(col("id")).as("urlHash"),
      concat(lit("h"), col("id") % 4 + 1, lit(".test")).as("host"), lit(1).as("depth"),
      lit(0L).as("pord"), col("id").as("pos"), lit(0).as("attempt"))
    mega.unionByName(tail)
  }

  test("salted politeness: no single task ranks the whole mega-host") {
    val budget = 500
    val salted = CrawlConfig(hostBudget = budget, saltFactor = 8)
    // AQE's small-DATA coalescing would merge these byte-tiny test
    // partitions back into one task and mask the row-level structure under
    // test (at real scale the partitions are GBs and never coalesce)
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
    val maxWithSalt = maxTaskShuffleRows {
      val (admitted, deferred) = Politeness.partition(skewedFrontier, salted)
      val a = admitted.filter(col("host") === "h0.test").count()
      assert(a === budget, s"mega-host must admit exactly budget rows, got $a")
      assert(deferred.filter(col("host") === "h0.test").count() === megaRows - budget)
    }
    // salted two-phase: phase 1 splits the mega-host over 8 salt groups
    // (~5k rows each), phase 2 ranks at most saltFactor*budget = 4k rows —
    // no task ever holds the 40k-row host
    assert(maxWithSalt < megaRows,
      s"salting must prevent a whole-mega-host task (max task rows = $maxWithSalt)")

    val maxNoSalt = maxTaskShuffleRows {
      Politeness.partition(skewedFrontier, salted.copy(saltFactor = 1))._1.count()
    }
    assert(maxNoSalt >= megaRows,
      s"control: without salting one task must rank the whole host (got $maxNoSalt)")
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
  }

  test("AQE splits a skewed LSH band join (skew=true in the final plan)") {
    // 3000 byte-identical docs share EVERY minhash band -> one hot bucket;
    // thresholds lowered so the toy partition qualifies as skewed
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    // hot keys need to concentrate in a few of MANY partitions for skew
    // detection (with 4 partitions everything looks uniformly heavy)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val docs = spark.range(800).select(col("id").as("doc_id"),
        lit("the exact same duplicated document body shared by every row").as("text"))
        .unionByName(spark.range(800, 1300).select(col("id").as("doc_id"),
          concat(lit("unique text number "), col("id"), lit(" with different words entirely")).as("text")))
      val pairs = graft.ops.Dedup.minhashNearDups(docs, threshold = 0.99)
      // collect on THIS df: AQE finalizes the plan per QueryExecution
      val n = pairs.collect().length
      assert(n === 800 * 799 / 2, "every identical-doc pair must verify at jaccard 1.0")
      val plan = pairs.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split on the hot duplicate cluster:\n${plan.take(4000)}")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
