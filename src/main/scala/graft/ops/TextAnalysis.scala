package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data pipelines: language-ID
  * (stopword/n-gram heuristic), quality scoring, token counting, and
  * winnowing document fingerprints. Quality/token ops are pure Column
  * expressions (codegen); langid and fingerprinting are compact Scala UDFs
  * over the text payload.
  */
object TextAnalysis {

  // ---------- language id (stopword-hit heuristic) ----------

  private val StopwordSets: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "pas", "pour", "que", "dans"),
    "es" -> Set("el", "los", "las", "es", "una", "por", "con", "para", "del", "como"))

  /** predict language from stopword hits; CJK codepoint share triggers "zh";
    * "und" (undetermined) when nothing matches
    */
  val langIdUdf = udf { (text: String) =>
    if (text == null || text.isEmpty) "und"
    else {
      val cjk = text.codePoints().toArray.count(cp =>
        (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF))
      if (cjk * 4 >= text.length) "zh"
      else {
        val toks = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
        if (toks.isEmpty) "und"
        else {
          val scores = StopwordSets.map { case (lang, sw) => lang -> toks.count(sw.contains) }
          val (best, hits) = scores.maxBy { case (l, n) => (n, l) }
          if (hits == 0) "und" else best
        }
      }
    }
  }

  def langId(text: Column): Column = langIdUdf(text)

  // ---------- quality score (pure Column, SQL-oracle-able) ----------

  /** Explicit half-up (toward +inf) rounding via floor — identical IEEE
    * double ops in Spark and DuckDB, so oracle comparison is bit-stable even
    * on exact .5 boundaries where the engines' round() rules differ. Every
    * float-valued query output goes through this on BOTH sides.
    */
  def halfUp(c: Column, digits: Int): Column = {
    val m = math.pow(10.0, digits)
    floor(c * m + 0.5) / m
  }

  def r4(c: Column): Column = halfUp(c, 4)


  /** length / punctuation-ratio / stopword-ratio / mean-word-length features
    * combined into a [0,1] quality score. All codegen'd built-ins.
    */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val words = split(t, "\\s+")
    val nWords = size(words)
    val punct = nChars - length(regexp_replace(t, "[.,;:!?]", ""))
    val stopHits = size(filter(words, w =>
      lower(w).isin("the", "and", "of", "to", "in", "a", "is", "that")))
    docs
      .withColumn("n_words", nWords)
      .withColumn("punct_ratio", r4(punct.cast("double") / nChars))
      .withColumn("stopword_ratio", r4(stopHits.cast("double") / nWords))
      .withColumn("mean_word_len",
        r4((nChars - nWords + 1).cast("double") / nWords))
  }

  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame =
    qualityFeatures(docs, textCol).withColumn("quality",
      r4(
        least(lit(1.0), col("n_words").cast("double") / 64.0) * 0.4 +
          (lit(1.0) - least(lit(1.0), col("punct_ratio") * 5)) * 0.2 +
          least(lit(1.0), col("stopword_ratio") * 4) * 0.2 +
          (lit(1.0) - least(lit(1.0), abs(col("mean_word_len") - 5.0) / 5.0)) * 0.2))

  // ---------- repetition features (Gopher/C4-style quality signals) ----------

  /** Per-doc repetition features over whitespace tokens:
    * `top_word_share` (count of the most frequent word / total words — the
    * boilerplate/spam signal) and `distinct_word_ratio` (vocabulary
    * richness). Shaped as explode → (doc, word) hash-aggregate →
    * (doc) hash-aggregate: two map-side-combining shuffles on (id, word)
    * / id keys, no window, no UDF — scales as any word-count job. Word
    * ties on count break toward the lexicographically smallest word
    * (irrelevant to the share value itself, which is what's exposed).
    */
  def repetitionFeatures(docs: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(filter(split(col(textCol), "\\s+"), w => w =!= "")).as("w"))
    words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("__top"), sum(col("c")).as("__n"),
        count(lit(1)).as("__distinct"))
      .select(col("doc_id"),
        r4(col("__top").cast("double") / col("__n")).as("top_word_share"),
        r4(col("__distinct").cast("double") / col("__n")).as("distinct_word_ratio"))
  }

  // ---------- token counting ----------

  /** whitespace token count (codegen) */
  def wsTokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: word chars in runs of <=4 + punctuation singles —
    * a deterministic proxy for tokenizer cost accounting
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w{1,4}|[^\\w\\s]"), lit(0)))

  // ---------- document fingerprint (winnowing, Schleimer et al. 2003) ----------

  /** Rolling-hash winnowing fingerprint: polynomial k-gram hashes mod
    * 1e9+7 (base 257), window minima, sorted distinct array<long>.
    *
    * Mod-p (NOT Java wrap-around mod 2^64) arithmetic by design: every hash
    * is a plain non-negative sum-of-products expressible in ANSI SQL, so the
    * DuckDB oracle recomputes the identical fingerprints from the raw text.
    * UDF because a rolling loop has no built-in equivalent; output is tiny
    * vs the text input.
    */
  val FpMod = 1000000007L
  val FpBase = 257L

  def fingerprintUdf(k: Int = 5, window: Int = 4) = udf { (text: String) =>
    if (text == null || text.length < k + window - 1) Array.empty[Long]
    else {
      val s = text.toLowerCase
      val M = FpMod
      val B = FpBase
      var powK1 = 1L // B^(k-1) mod M
      (1 until k).foreach(_ => powK1 = powK1 * B % M)
      val n = s.length - k + 1
      val hashes = new Array[Long](n)
      var h = 0L
      var i = 0
      while (i < k) { h = (h * B + s.charAt(i)) % M; i += 1 }
      hashes(0) = h
      i = 1
      while (i < n) {
        h = ((h - s.charAt(i - 1) * powK1 % M + M) % M * B + s.charAt(i + k - 1)) % M
        hashes(i) = h
        i += 1
      }
      val out = scala.collection.mutable.SortedSet[Long]()
      var w = 0
      while (w + window <= n) {
        var m = hashes(w)
        var j = 1
        while (j < window) { if (hashes(w + j) < m) m = hashes(w + j); j += 1 }
        out += m
        w += 1
      }
      out.toArray
    }
  }
}
