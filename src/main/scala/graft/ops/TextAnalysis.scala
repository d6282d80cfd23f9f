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

  // ---------- corpus-statistical scoring (LM quality, tf-idf) ----------

  /** whitespace tokens with empties dropped, as an array column */
  private def toks(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  /** integer floor(log2(c)) for c >= 1, computed EXACTLY via the length
    * of the binary string — no float log, so the value is identical in
    * any engine (log2 via float drifts at powers of two)
    */
  private def ilog2(c: Column): Column = length(bin(c)) - 1

  /** Corpus-trained bigram language-model score — the deterministic form
    * of CCNet/CC-Net-style LM-perplexity quality filtering: score each
    * document by how predictable its word bigrams are under counts
    * gathered from the corpus itself. Per bigram instance the
    * contribution is `ilog2(count(w1 w2)) - ilog2(count(w1))` — an
    * integer floor-log2 conditional log-probability (always <= 0); the
    * doc score is the sum, and `lm_per_tok` = score scaled by 1000 and
    * divided by the bigram count (integer division) for a length-free
    * figure. All arithmetic is BIGINT: sums are order-free, so the
    * result is exact at any parallelism and value-oracle-able — a float
    * perplexity never is.
    *
    * Scale shape: bigram instances explode map-side (one pass, HOF over
    * the token array — no self-join to pair neighbors); the count tables
    * are vocab-sized (<< corpus) and build with map-side-combining hash
    * aggregates; scoring joins instance streams to counts on the bigram/
    * unigram string keys and folds per doc with partial aggregation. At
    * a 10^8-type vocabulary the count tables stay distributed (shuffle
    * join) — broadcast only if a deployment's vocab fits.
    *
    * No silent row loss: docs with < 2 tokens return n_bigrams = 0,
    * lm_score = 0. Returns (idCol, n_bigrams, lm_score, lm_per_tok).
    */
  def lmScore(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(col(idCol).as("__id"), toks(col(textCol)).as("__t"))
    // one map-side pass: per doc, the list of (w1, bigram) instances.
    // Docs with < 2 tokens are filtered BEFORE the explode — Spark's
    // sequence(0, -1) is the DESCENDING [0, -1] and __t[-1] throws under
    // ANSI; the trailing left join restores them with zero scores.
    // the corpus-sized instance stream shuffles three times (bigram join,
    // unigram join, per-doc fold) — key it on 8-byte xxhash64 values, never
    // the variable-width token strings (the repo's fixed-width-key rule).
    // A hash collision merges two count cells (~2^-64 per distinct-pair —
    // the same conservative posture as decontam's gram hashes); the
    // strings themselves never leave the map side.
    val inst = base.filter(size(col("__t")) >= 2).select(col("__id"),
      explode(expr("transform(sequence(0, size(__t) - 2), i -> " +
        "struct(xxhash64(__t[i]) AS w1h, xxhash64(concat(__t[i], ' ', __t[i + 1])) AS bgh))")).as("p"))
      .select(col("__id"), col("p.w1h").as("w1h"), col("p.bgh").as("bgh"))
    val bgCounts = inst.groupBy("bgh").agg(count(lit(1)).as("__cbg"))
    val w1Counts = inst.groupBy("w1h").agg(count(lit(1)).as("__cw1"))
    val scored = inst
      .join(bgCounts, "bgh").join(w1Counts, "w1h")
      .groupBy("__id").agg(
        count(lit(1)).as("n_bigrams"),
        sum(ilog2(col("__cbg")) - ilog2(col("__cw1"))).cast("long").as("lm_score"))
    base.select(col("__id")).join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0L)).as("lm_score"),
        // negate-divide-negate: Spark `div` truncates toward zero but
        // SQL `//` floors — on the (always <= 0) score they disagree;
        // dividing the negated (non-negative) value is identical in both
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          -expr("((-lm_score) * 1000) div n_bigrams")).otherwise(lit(0L)).as("lm_per_tok"))
  }

  /** Per-document top-k keywords by integer tf-idf: term score =
    * tf * (ilog2(N) - ilog2(df)) with ties broken by term string — all
    * BIGINT, so ranking is deterministic at any parallelism. One
    * (doc, word) hash aggregate for tf, one word aggregate for df, a
    * broadcast one-row N, and a rank-k window that Spark plans with
    * WindowGroupLimit (partial top-k before the exchange).
    * Returns (idCol, term, tf, score, rk), rk = 1..k per doc.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.agg(count(lit(1)).as("__N"))
    val words = docs.select(col(idCol).as("__id"),
      explode(toks(col(textCol))).as("w"))
    val tf = words.groupBy("__id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("__df"))
    val scoredW = tf.join(df, "w").crossJoin(broadcast(nDocs))
      .select(col("__id"), col("w"),  col("tf"),
        (col("tf") * (ilog2(col("__N")) - ilog2(col("__df")))).cast("long").as("score"))
    val win = Window.partitionBy("__id").orderBy(col("score").desc, col("w"))
    scoredW.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .select(col("__id").as(idCol), col("w").as("term"), col("tf"),
        col("score"), col("rk").cast("long").as("rk"))
  }

  /** Per-language corpus report — doc counts, token totals, and EXACT
    * integer percentiles of a bounded-domain value column (doc length,
    * token count): the funnel numbers a curation run publishes alongside
    * its output. Percentile p = the value at 1-based rank
    * `ceil(n * p / 100)` of the ascending sort — computed WITHOUT a
    * global sort via the value histogram: per (lang, value) counts
    * (map-side combining), a running sum over each language's histogram
    * (histogram size = distinct values, NOT corpus size — the window is
    * over thousands of rows however large the corpus), and a min-value
    * pick at the target rank. Exact, deterministic, all BIGINT — unlike
    * approx_percentile, which is neither exact nor engine-portable.
    */
  def corpusStats(docs: DataFrame, textCol: String = "text",
                  langCol: String = "lang",
                  valueCol: String = "n_chars"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.groupBy(col(langCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(wsTokenCount(col(textCol))).cast("long").as("total_tokens"))
    val hist = docs.select(col(langCol), col(valueCol).as("v"))
      .groupBy(langCol, "v").agg(count(lit(1)).as("c"))
    val byLang = Window.partitionBy(col(langCol))
    val cum = hist
      .withColumn("cum", sum("c").over(byLang.orderBy("v")))
      .withColumn("n", sum("c").over(byLang))
    val pcts = cum.groupBy(col(langCol)).agg(
      min(when(col("cum") >= expr("(n * 50 + 99) div 100"), col("v")))
        .cast("long").as(s"p50_$valueCol"),
      min(when(col("cum") >= expr("(n * 90 + 99) div 100"), col("v")))
        .cast("long").as(s"p90_$valueCol"))
    tok.join(pcts, langCol)
  }

  // ---------- text normalization (NFC + control strip + ws collapse) ----------

  /** Canonical text cleanup: Unicode NFC composition (codegen expression,
    * [[graft.functions.Normalize.nfc]]), strip C0 control characters
    * other than tab/newline/CR plus DEL, collapse whitespace runs to one
    * space, trim. The standard first pass of a webtext pipeline — run
    * BEFORE any hashing/shingling so dedup keys see one byte
    * representation per logically-identical string.
    *
    * Map-only and fully inside whole-stage codegen (the regexes are
    * Spark built-ins; the char classes stay in the Java-regex/RE2 common
    * subset so the DuckDB `nfc_normalize` oracle replays it exactly).
    * Order matters and is part of the contract: compose first (so a
    * stray combining mark joins its base before anything else looks at
    * bytes), strip controls second (removed outright, NOT turned into
    * spaces), collapse+trim last.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.Normalize.nfc(text),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "\\s+", " "))

  // ---------- cross-document duplicate n-gram share ----------

  /** Per-document duplicate-n-gram statistics: of a doc's DISTINCT word
    * n-grams, how many occur in at least one OTHER document — the
    * standard "dup_ngram_frac" quality signal (boilerplate, templated
    * spam and licence-header pages score high; original prose scores
    * low) used as a filter threshold in published webtext pipelines.
    *
    * Output: one row per input doc (no silent row loss) —
    * (idCol, n_grams, n_dup, dup_bp) with `dup_bp` = basis points
    * `n_dup*10000 div n_grams` (integer — exactly reproducible at any
    * parallelism, unlike a float ratio). Docs shorter than `n` words
    * fall back to the whole-text hash (the shingler convention), so an
    * exact duplicate of a short doc still counts.
    *
    * Scale shape: grams are 8-byte xxhash64 shingle hashes straight off
    * the text bytes (codegen, no gram strings); the first aggregate
    * (gram → doc count) map-side-combines per-doc-distinct hashes, the
    * join back is an 8-byte-key hash join against only the SHARED grams
    * (cnt ≥ 2 — the minority), and the final per-doc fold map-side
    * combines again. Two shuffles total, both on fixed-width keys; the
    * text column is scanned twice but never shuffled. Hash collisions
    * can only over-count (same conservative direction as decontam).
    */
  def dupNgramStats(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", n: Int = 5): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
      explode_outer(graft.functions.MinHash.shingle_hashes(col(textCol), word = true, n)).as("g"))
    val shared = grams.groupBy("g").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= 2).select(col("g"), lit(1).as("__dup"))
    grams.join(shared, Seq("g"), "left")
      .groupBy("doc_id").agg(
        count(col("g")).as("n_grams"),
        sum(coalesce(col("__dup"), lit(0))).cast("long").as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        when(col("n_grams") === 0, 0L)
          .otherwise(expr("n_dup * 10000 div n_grams")).as("dup_bp"))
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
