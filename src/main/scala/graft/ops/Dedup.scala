package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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

  /** LSH banding: per-band bucket hashes of the signature, as one codegen'd
    * pass (graft.functions.BandHashes) — the HOF formulation (transform +
    * slice + concat_ws + xxhash64) interprets every lambda and re-evaluates
    * its input per band. posexplode supplies the band index.
    */
  def lshBandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    graft.functions.MinHash.band_hashes(sig, bands, rowsPerBand)

  /** Band count tuned to the verification threshold via the LSH S-curve
    * ((1/b)^(b/numHashes) ≈ collision threshold): the FEWEST bands whose
    * curve sits at or below `threshold`. Mis-tuned banding is a scale
    * killer — e.g. 16×4 banding at threshold 0.95 over small-alphabet char
    * n-grams buckets nearly every random pair, exploding the candidate join
    * quadratically; 4×16 banding prunes them while keeping >=threshold
    * recall high (verification is exact, so precision is unaffected).
    */
  def chooseBands(numHashes: Int, threshold: Double): Int = {
    val divisors = (1 to numHashes).filter(numHashes % _ == 0)
    divisors.find { b =>
      math.pow(1.0 / b, b.toDouble / numHashes) <= threshold
    }.getOrElse(numHashes)
  }

  /** Join candidate id-pairs back to a per-id payload table ONCE per side —
    * the de-amplified LSH verification shape: the heavy payload (shingle set
    * / vector) crosses the wire exactly twice in total, not once per band ×
    * side. `pairs` needs columns (a, b); `payload` needs (id, <payloadCol>).
    */
  private[graft] def attachPayloads(pairs: DataFrame, payload: DataFrame, payloadCol: String): DataFrame =
    pairs
      .join(payload.select(col("id").as("a"), col(payloadCol).as(s"${payloadCol}a")), Seq("a"))
      .join(payload.select(col("id").as("b"), col(payloadCol).as(s"${payloadCol}b")), Seq("b"))

  /** End-to-end MinHash-LSH near-duplicate pairs: shingle → signature →
    * band-bucket equi-join on (band, bandHash) carrying ids ONLY → exact
    * Jaccard verification via one payload re-join per side. The shingle
    * arrays never ride the band join (which would amplify shuffle volume by
    * 2 × bands); only 16-byte id rows do.
    * Returns (a, b, jaccard) with a < b and jaccard >= threshold.
    */
  def minhashNearDups(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3,
      numHashes: Int = 128,
      threshold: Double = 0.7,
      seed: Long = 42L,
      /** 0 = derive from threshold via [[chooseBands]] */
      bandsOverride: Int = 0): DataFrame = {
    val bands = if (bandsOverride > 0) bandsOverride else chooseBands(numHashes, threshold)
    val rowsPerBand = numHashes / bands
    // the shingle table feeds candidate generation AND both verification
    // joins — persist so the (expensive) shingling pass runs once, not 3x;
    // ~8-16 bytes/shingle columnar, spills to disk if it outgrows memory
    val shingled = docs.select(col(idCol).as("id"), wordShingles(col(textCol), k).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val buckets = shingled
      .select(col("id"),
        posexplode(lshBandHashes(minhashSignature(col("sh"), numHashes, seed), bands, rowsPerBand))
          .as(Seq("band", "bandHash")))
    val l = buckets.select(col("band"), col("bandHash"), col("id").as("a"))
    val r = buckets.select(col("band"), col("bandHash"), col("id").as("b"))
    val pairs = l.join(r, Seq("band", "bandHash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .dropDuplicates("a", "b")
    attachPayloads(pairs, shingled, "sh")
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), TextAnalysis.halfUp(col("jaccard"), 4).as("jaccard"))
  }

  // ---------- simhash ----------

  /** 64-bit SimHash over whitespace tokens. A Scala UDF (bit-counting loop);
    * cheap relative to the shuffle it feeds, upgrade to a codegen Expression
    * only if profiled hot.
    *
    * Token hash = low 64 bits of MD5 (digest bytes 8..15, little-endian) —
    * chosen because it is exactly reproducible in the DuckDB oracle
    * (`md5_number_lower`), so the whole simhash pipeline is SQL-checkable
    * end to end, unlike a JVM-private mixing chain.
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  val simhash64 = udf { (text: String) =>
    if (text == null) 0L
    else {
      val md = md5Local.get()
      val counts = new Array[Int](64)
      for (tok <- text.split("\\s+") if tok.nonEmpty) {
        val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var j = 15
        while (j >= 8) { h = (h << 8) | (d(j) & 0xFFL); j -= 1 }
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
    * banding over char n-grams instead of word shingles. Same de-amplified
    * shape as [[minhashNearDups]]: ids through the band join, n-gram arrays
    * only through the two verification joins.
    */
  def ngramJaccardNearDups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                           n: Int = 3, threshold: Double = 0.6,
                           numHashes: Int = 64, bandsOverride: Int = 0): DataFrame = {
    val bands = if (bandsOverride > 0) bandsOverride else chooseBands(numHashes, threshold)
    val grams = docs.select(col(idCol).as("id"), charNgrams(col(textCol), n).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK) // one shingling pass (see minhashNearDups)
    val buckets = grams
      .select(col("id"),
        posexplode(lshBandHashes(minhashSignature(col("sh"), numHashes, seed = 7L), bands, numHashes / bands))
          .as(Seq("band", "bandHash")))
    val l = buckets.select(col("band"), col("bandHash"), col("id").as("a"))
    val r = buckets.select(col("band"), col("bandHash"), col("id").as("b"))
    val pairs = l.join(r, Seq("band", "bandHash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .dropDuplicates("a", "b")
    attachPayloads(pairs, grams, "sh")
      .withColumn("jaccard", jaccard(col("sha"), col("shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), TextAnalysis.halfUp(col("jaccard"), 4).as("jaccard"))
  }
}
