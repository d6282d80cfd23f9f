package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All are shuffle-shaped as
  * group-by / bucket-join — never an all-pairs cross join — so they scale to
  * web-corpus row counts: LSH candidate generation is an equi-join on
  * (band, bandHash) buckets, and only candidate pairs pay the exact-verify
  * cost.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact-duplicate groups by content hash: (h, n, keep) for groups >1. */
  def exactDupGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep"))
      .filter(col("n") > 1)

  /** Keep one row (min id) per distinct text — the exact-dedup pass. */
  def exactDedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ---------- shingles / minhash ----------

  /** distinct word k-shingle hashes of a text column — a custom codegen
    * Expression (graft.functions.ShingleHashes): the built-in HOF chain
    * builds every shingle string on the heap and interprets every lambda
    */
  def wordShingles(text: Column, k: Int = 3): Column =
    graft.functions.MinHash.shingle_hashes(text, word = true, k)


  /** MinHash signature: array of numHashes minima of (a_j*h + b_j) mod p —
    * compiled loop (graft.functions.MinHashSig), not N interpreted
    * array_min(transform(...)) passes
    */
  def minhashSignature(shingles: Column, numHashes: Int = 128, seed: Long = 42L): Column =
    graft.functions.MinHash.minhash_sig(shingles, numHashes, seed)

  /** LSH banding: explode the signature into (band, bandHash) bucket keys. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"), xxhash64(concat_ws(",",
        transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), x => x.cast("string")))).as("bandHash")))

  /** End-to-end MinHash-LSH near-duplicate pairs: shingle → signature →
    * band-bucket equi-join → exact Jaccard verification on candidates only.
    * Returns (a, b, jaccard) with a < b and jaccard >= threshold.
    */
  def minhashNearDups(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.7,
      seed: Long = 42L): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = docs
      .select(col(idCol).as("id"), wordShingles(col(textCol), k).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes, seed))
    val buckets = withSig
      .select(col("id"), col("sh"), explode(lshBands(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band").as("band"), col("bk.bandHash").as("bandHash"))
    val l = buckets.select(col("band"), col("bandHash"), col("id").as("a"), col("sh").as("sha"))
    val r = buckets.select(col("band"), col("bandHash"), col("id").as("b"), col("sh").as("shb"))
    l.join(r, Seq("band", "bandHash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sha"), col("shb"))
      .dropDuplicates("a", "b")
      .withColumn("jaccard",
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---------- simhash ----------

  /** 64-bit SimHash over whitespace tokens. A Scala UDF (bit-counting loop);
    * cheap relative to the shuffle it feeds, upgrade to a codegen Expression
    * only if profiled hot.
    */
  val simhash64 = udf { (text: String) =>
    if (text == null) 0L
    else {
      val counts = new Array[Int](64)
      for (tok <- text.split("\\s+") if tok.nonEmpty) {
        var h = 0x9E3779B97F4A7C15L * tok.hashCode
        h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L; h ^= h >>> 27
        var i = 0
        while (i < 64) { counts(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
      }
      var out = 0L
      var i = 0
      while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
      out
    }
  }

  /** SimHash near-dup pairs: band the 64 bits into 4×16-bit keys (any pair
    * within hamming distance <= 3 shares at least one band — pigeonhole),
    * bucket-join, verify exact hamming distance.
    */
  def simhashNearDups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.select(col("band"), col("key"), col("id").as("a"), col("sig").as("siga"))
    val r = banded.select(col("band"), col("key"), col("id").as("b"), col("sig").as("sigb"))
    l.join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("hamming", bit_count(col("siga").bitwiseXOR(col("sigb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  // ---------- n-gram jaccard ----------

  /** distinct character n-gram hashes (codegen Expression, byte n-grams) */
  def charNgrams(text: Column, n: Int = 3): Column =
    graft.functions.MinHash.shingle_hashes(text, word = false, n)

  /** exact Jaccard similarity of two pre-computed ngram/shingle arrays */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** Character-n-gram Jaccard near-dups, LSH-accelerated: reuses the minhash
    * banding over char n-grams instead of word shingles.
    */
  def ngramJaccardNearDups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                           n: Int = 3, threshold: Double = 0.6): DataFrame = {
    val withNg = docs.select(col(idCol).as("id"), charNgrams(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), 64, seed = 7L))
    val buckets = withNg
      .select(col("id"), col("sh"), explode(lshBands(col("sig"), 16, 4)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band").as("band"), col("bk.bandHash").as("bandHash"))
    val l = buckets.select(col("band"), col("bandHash"), col("id").as("a"), col("sh").as("sha"))
    val r = buckets.select(col("band"), col("bandHash"), col("id").as("b"), col("sh").as("shb"))
    l.join(r, Seq("band", "bandHash"))
      .filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
