package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass, allocation-light shingling + MinHash.
  *
  * The built-in formulation (split → transform/slice/concat_ws → xxhash64 →
  * N × array_min(transform(...))) evaluates every higher-order lambda
  * interpretively and builds every shingle string on the heap; at corpus
  * scale that dominated the dedup benchmark. These two expressions do the
  * same math as compiled loops over the raw UTF8 bytes — zero intermediate
  * strings — and sit inside whole-stage codegen via static calls.
  */
object MinHashFns {

  private val MersennePrime = (1L << 31) - 1

  /** deterministic per-permutation coefficients (splitmix64, seed-fixed);
    * identical scheme to graft.ops.Dedup.coeff
    */
  private def coeff(seed: Long, j: Int, which: Int): Long = {
    var z = seed + j.toLong * 0x9E3779B97F4A7C15L + which * 0xBF58476D1CE4E5B9L
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^= z >>> 31
    (z & Long.MaxValue) % MersennePrime
  }

  private val coeffCache = new ConcurrentHashMap[(Long, Int), (Array[Long], Array[Long])]()
  private def coeffs(seed: Long, numHashes: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent((seed, numHashes), { case (s, n) =>
      (Array.tabulate(n)(j => coeff(s, j, 1) | 1L), Array.tabulate(n)(j => coeff(s, j, 2)))
    })

  private def mix2(a: Long, b: Long): Long = {
    var z = a * 0x9E3779B97F4A7C15L + b
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** sorted-distinct Array[Long] -> ArrayData */
  private def dedupSorted(hs: Array[Long], n: Int): ArrayData = {
    java.util.Arrays.sort(hs, 0, n)
    var w = 0
    var i = 0
    while (i < n) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** distinct word-k-shingle hashes, straight off the UTF8 bytes: hash each
    * word span with XXH64, combine k consecutive word hashes with a mix
    * chain. No shingle strings are ever built.
    */
  def wordShingleHashes(s: UTF8String, k: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // collect word hashes
    var words = new Array[Long](16)
    var nw = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(s.getByte(i))) i += 1
      val start = i
      while (i < len && !isWs(s.getByte(i))) i += 1
      if (i > start) {
        if (nw == words.length) words = java.util.Arrays.copyOf(words, nw * 2)
        words(nw) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        nw += 1
      }
    }
    if (nw < k) {
      // matches the built-in fallback: whole-text hash when too few words
      return new GenericArrayData(Array(XXH64.hashUnsafeBytes(base, off, len, 42L)))
    }
    val out = new Array[Long](nw - k + 1)
    var j = 0
    while (j + k <= nw) {
      var h = words(j)
      var t = 1
      while (t < k) { h = mix2(h, words(j + t)); t += 1 }
      out(j) = h
      j += 1
    }
    dedupSorted(out, out.length)
  }

  /** distinct byte-n-gram hashes (char n-grams on ASCII; multi-byte chars
    * hash at byte granularity, which is fine for near-dup detection)
    */
  def charNgramHashes(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    if (len < n)
      return new GenericArrayData(Array(XXH64.hashUnsafeBytes(base, off, len, 42L)))
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i + n <= len) {
      out(i) = XXH64.hashUnsafeBytes(base, off + i, n, 42L)
      i += 1
    }
    dedupSorted(out, out.length)
  }

  /** LSH band hashes over a minhash signature: band b = mix chain over
    * sig[b*rowsPerBand .. +rowsPerBand-1]. One compiled pass; the Column
    * formulation (transform + slice + concat_ws + xxhash64) interprets every
    * lambda and builds per-band strings — measured ~20x slower per row.
    */
  def bandHashes(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < rowsPerBand) { h = mix2(h, sig.getLong(b * rowsPerBand + i)); i += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature over precomputed shingle hashes (same (a*h+b) mod
    * 2^31-1 scheme as the Column formulation, compiled)
    */
  def minhashSig(hashes: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val (as, bs) = coeffs(seed, numHashes)
    val n = hashes.numElements()
    val out = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val a = as(j); val b = bs(j)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = { val x = hashes.getLong(i) % MersennePrime; if (x < 0) x + MersennePrime else x }
        val v = (h * a + b) % MersennePrime
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** distinct shingle hashes of a string column (word=true: word k-shingles;
  * word=false: char n-grams)
  */
case class ShingleHashes(child: Expression, word: Boolean, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    if (word) MinHashFns.wordShingleHashes(v.asInstanceOf[UTF8String], k)
    else MinHashFns.charNgramHashes(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (word) s"${ev.value} = graft.functions.MinHashFns.wordShingleHashes($c, $k);"
      else s"${ev.value} = graft.functions.MinHashFns.charNgramHashes($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of an array<long> shingle-hash column */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires an array<long> argument, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    MinHashFns.minhashSig(v.asInstanceOf[ArrayData], numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashFns.minhashSig($c, $numHashes, ${seed}L);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** per-band LSH bucket hashes of an array<long> minhash signature */
case class BandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_band_hashes requires an array<long> argument, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    MinHashFns.bandHashes(v.asInstanceOf[ArrayData], bands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashFns.bandHashes($c, $bands, $rowsPerBand);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash {
  def shingle_hashes(text: Column, word: Boolean, k: Int): Column =
    GraftShims.column(ShingleHashes(GraftShims.expression(text), word, k))
  def minhash_sig(hashes: Column, numHashes: Int, seed: Long): Column =
    GraftShims.column(MinHashSig(GraftShims.expression(hashes), numHashes, seed))
  def band_hashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    GraftShims.column(BandHashes(GraftShims.expression(sig), bands, rowsPerBand))
}
