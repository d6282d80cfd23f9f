package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share word
  * n-grams with an evaluation set, the standard pre-training hygiene pass
  * (exact n-gram overlap, the method published for GPT-3/PaLM/Llama data
  * cards).
  *
  * Scale shape: the eval set is SMALL (thousands of documents) and the
  * corpus is the 100-TB side, so the match is a broadcast hash join on
  * 8-byte n-gram hashes: the corpus side is ONE map-side pass — shingle
  * (codegen, [[graft.functions.MinHash.shingle_hashes]]), explode, probe
  * the broadcast set, partial-aggregate per doc — and the only exchange
  * carries ~one folded row per document. Matching on 64-bit hashes
  * instead of gram strings keeps the broadcast table and the probe keys
  * fixed-width; a hash collision can only over-flag (flagging is
  * conservative), never leak contamination.
  */
object Decontam {

  /** distinct word-n-gram hashes of a text column; texts with fewer than
    * `n` words fall back to the whole-text hash (same convention as the
    * dedup shinglers — a short eval answer still matches verbatim copies)
    */
  def gramHashes(text: Column, n: Int): Column =
    graft.functions.MinHash.shingle_hashes(text, word = true, n)

  /** The distinct n-gram hash set of the eval corpus, as a DataFrame of
    * (`g`: long). Materialize once per eval release and reuse across
    * decontamination runs.
    */
  def evalGramSet(evalDocs: DataFrame, textCol: String = "text", n: Int = 13): DataFrame =
    evalDocs.select(explode(gramHashes(col(textCol), n)).as("g")).distinct()

  /** Per-document contamination report against `evalDocs`: one row per
    * input doc — (idCol, n_grams, n_hit, contaminated) where `n_hit`
    * counts the doc's distinct n-grams that appear anywhere in the eval
    * set and `contaminated` is 1 iff any do. No silent row loss: clean
    * docs report n_hit = 0.
    */
  def flagContaminated(
      docs: DataFrame,
      evalDocs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 13): DataFrame = {
    val evalGrams = evalGramSet(evalDocs, textCol, n)
    // ONE pass over the corpus: explode (explode_outer — a gram-less doc
    // still reports, no silent row loss), probe the broadcast set, fold to
    // one row per doc. Map-side partial aggregation collapses each doc's
    // gram rows inside its own scan partition, so the exchange carries
    // ~one row per document, not one per gram.
    val exploded = docs.select(col(idCol).as("doc_id"),
      explode_outer(gramHashes(col(textCol), n)).as("g"))
    val marked = exploded.join(
      broadcast(evalGrams.withColumn("__hit", lit(1))), Seq("g"), "left")
    marked.groupBy("doc_id").agg(
      count(col("g")).as("n_grams"),
      sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        when(col("n_hit") > 0, 1).otherwise(0).as("contaminated"))
  }
}
