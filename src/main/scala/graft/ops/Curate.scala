package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs over a crawled document store, assembled from the
  * engine's first-class ops:
  *
  *   1. ANNOTATE (one pass, no shuffle): language-ID
  *      ([[TextAnalysis.langId]]), quality score
  *      ([[TextAnalysis.qualityScore]]), token count.
  *   2. FILTER: language allowlist, quality floor, token-count bounds —
  *      all plain codegen predicates, evaluated in the same stage as the
  *      annotation pass.
  *   3. DEDUP: [[Dedup.dedupCorpus]] on the survivors — exact sha-256
  *      clustering FIRST (bounds boilerplate at O(cluster)), MinHash-LSH
  *      near-dup on representatives, keep-smallest re-expansion.
  *
  * Output contract — NO SILENT ROW LOSS, the cardinal sin of corpus
  * pipelines: [[curate]] returns the curated table AND a per-input-doc
  * audit `(doc_id, verdict, dup_of)` where verdict ∈ {kept, lang,
  * quality, tokens, duplicate}. Every input id appears exactly once;
  * `audit.groupBy("verdict").count()` is the pipeline's funnel report and
  * costs one cheap aggregate, not one action per stage.
  *
  * Scale shape: stage 1-2 are a single map-only pass; stage 3's shuffles
  * are the (capped, de-amplified) dedup shapes already pinned by
  * PlanSpec/DedupCorpusSpec. Nothing here adds a new shuffle.
  */
object Curate {

  final case class CurateConfig(
      /** language allowlist; empty = keep every language */
      langs: Seq[String] = Seq("en"),
      minQuality: Double = 0.3,
      minTokens: Int = 5,
      maxTokens: Int = 1 << 20,
      /** near-dup Jaccard threshold for the dedup stage */
      nearDupThreshold: Double = 0.7,
      /** hot-bucket guard for the LSH stage ([[Dedup.capBuckets]]); <=0 off */
      maxBucketSize: Int = 0)

  /** the one-pass annotation: lang, quality (+ features), ws token count */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame =
    TextAnalysis.qualityScore(docs, textCol)
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("ws_tokens", TextAnalysis.wsTokenCount(col(textCol)))

  private def filterVerdict(cfg: CurateConfig): Column = {
    val langBad =
      if (cfg.langs.isEmpty) lit(false) else !col("lang_pred").isin(cfg.langs: _*)
    when(langBad, "lang")
      .when(col("quality") < cfg.minQuality, "quality")
      .when(col("ws_tokens") < cfg.minTokens || col("ws_tokens") > cfg.maxTokens, "tokens")
  }

  /** Token-budget shard packing — assign docs to fixed-token-budget
    * training shards: docs in `idCol` order pack greedily, each doc going
    * to the shard its cumulative-token START offset falls in
    * (shard = floor(exclusive-prefix-sum / tokensPerShard); a doc larger
    * than the budget overflows its own shard rather than splitting).
    *
    * Scale shape: a global prefix sum WITHOUT a single-partition window —
    * the classic two-pass scan as DataFrames: range-repartition by id,
    * per-partition cumsum (window keyed on the partition id — rows
    * shuffle once on a 4-byte key), plus broadcast per-partition offsets
    * (one row per partition, exclusive-prefix-summed on the driver).
    * The partition-id column is computed once on a cached frame so both
    * passes see identical partitioning; the OUTPUT depends only on the
    * global id order, never on where partition boundaries fell.
    *
    * Returns (doc_id, n_tokens, shard), one row per input doc.
    */
  def packShards(docs: DataFrame, tokensPerShard: Long,
                 textCol: String = "text", idCol: String = "doc_id",
                 partitions: Int = 0): DataFrame = {
    require(tokensPerShard > 0, "tokensPerShard must be positive")
    val spark = docs.sparkSession
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("n_tokens"))
    val ranged = OpCaches.persist(
      toks.repartitionByRange(nParts, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .withColumn("__pid", spark_partition_id()),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition totals -> driver exclusive prefix (one row per
    // partition; range partitions are ordered by construction)
    val totals = ranged.groupBy(col("__pid")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val exclusive = totals.map(_._2).scanLeft(0L)(_ + _).init
    val offsetRows = totals.map(_._1).zip(exclusive)
    import spark.implicits._
    val offsetsDf = offsetRows.toSeq.toDF("__pid", "__off")
    // pass 2: partition-local cumsum + the broadcast per-partition offset;
    // integer arithmetic throughout (token sums overflow double precision
    // long before they overflow a long)
    val w = Window.partitionBy(col("__pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn("__cum", sum(col("n_tokens")).over(w) + col("__off"))
      .withColumn("__start", col("__cum") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"__start div ${tokensPerShard}L").as("shard"))
  }

  /** The full corpus → training-shards pipeline: [[curate]], then
    * [[packShards]] over the survivors — the artifact a training run
    * actually consumes (docs in id order, packed to `tokensPerShard`
    * budgets). Returns ((doc_id, n_tokens, shard) over kept docs, audit).
    * No shuffle shapes beyond the two composed ops' pinned ones.
    */
  def curateAndPack(docs: DataFrame, tokensPerShard: Long,
                    cfg: CurateConfig = CurateConfig(),
                    textCol: String = "text", idCol: String = "doc_id"): (DataFrame, DataFrame) = {
    val (curated, audit) = curate(docs, cfg, textCol, idCol)
    (packShards(curated, tokensPerShard, textCol, idCol), audit)
  }

  /** Materialize packed shards as a `shard=`-partitioned parquet table and
    * return the read-back manifest (shard, n_docs, n_tokens) — the final
    * step of the corpus → training-shards pipeline.
    *
    * Scale shape: [[packShards]]' output partitions hold CONTIGUOUS doc_id
    * ranges (range partition → per-partition window keyed on the partition
    * id), and shard = floor(prefix/budget) is monotone in doc_id — so each
    * write task emits a handful of ADJACENT shard directories, not one
    * file per shard per task (the small-file explosion `partitionBy` causes
    * on hash-partitioned input). The manifest is computed FROM THE WRITTEN
    * FILES, so it verifies the write rather than restating the plan.
    */
  def writeShards(docs: DataFrame, packed: DataFrame, outDir: String,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    docs.select(col(idCol), col(textCol))
      .join(packed.select(col("doc_id").as(idCol), col("n_tokens"), col("shard")), Seq(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
    docs.sparkSession.read.parquet(outDir)
      // partition-column type inference narrows shard to int — pin long
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }

  /** (curated, audit): curated = the input's columns plus the annotation
    * columns, one row per surviving doc; audit = one row per INPUT doc
    * with its verdict (and `dup_of` for duplicates).
    */
  def curate(docs: DataFrame, cfg: CurateConfig = CurateConfig(),
             textCol: String = "text", idCol: String = "doc_id"): (DataFrame, DataFrame) = {
    // annotations feed the filter, the audit, and the curated output —
    // one pass, cached (caller releases via OpCaches.releaseAll())
    val ann = OpCaches.persist(
      annotate(docs, textCol).withColumn("__verdict", filterVerdict(cfg)),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val passed = ann.filter(col("__verdict").isNull)
    // (doc_id, dup_of, kept) for every doc that passed the filters
    val dd = Dedup.dedupCorpus(passed, textCol, idCol,
      threshold = cfg.nearDupThreshold, maxBucketSize = cfg.maxBucketSize)
    val curated = passed
      .join(dd.filter(col("kept")).select(col("doc_id").as(idCol)), Seq(idCol), "left_semi")
      .drop("__verdict")
    val audit = ann.select(col(idCol).as("doc_id"), col("__verdict"))
      .join(dd.select(col("doc_id"), col("dup_of"), col("kept")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__verdict"),
          when(col("kept"), "kept").otherwise("duplicate")).as("verdict"),
        when(!coalesce(col("kept"), lit(true)), col("dup_of")).as("dup_of"))
    (curated, audit)
  }
}
