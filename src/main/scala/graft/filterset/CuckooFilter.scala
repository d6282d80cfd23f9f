package graft.filterset

import scala.collection.mutable.ArrayBuffer

/** Cuckoo filter over 64-bit keys (Fan et al., CoNEXT 2014): bucketized
  * partial-key cuckoo hashing — 4 slots/bucket, 16-bit fingerprints,
  * ~0.02% FPR at 95% load.
  *
  * The north rule allows "bloom/cuckoo" for the URL-seen pre-filter; this
  * is the cuckoo option for [[BloomShards]]' per-shard role. Same contract
  * as the bloom: ZERO false negatives (an inserted key always answers
  * maybe-present), so the exact anti-join stays the authority and
  * "definitely unseen" rows may skip it. What cuckoo adds over bloom:
  * O(1) DELETION (retire URLs from the pre-filter when a compaction drops
  * them) and better FPR per bit at high load.
  *
  * Insert failures near capacity park the displaced fingerprint in a
  * victim list (checked by every lookup), which preserves the
  * no-false-negative contract instead of silently dropping — a cuckoo
  * table cannot be grown in place because fingerprints lose the original
  * key. A victim list larger than a handful means the filter was
  * undersized; [[CuckooFilter.create]] sizes for 95% load, and `put` warns
  * at [[CuckooFilter.WarnVictims]] parked victims then fails fast with a
  * sizing hint past [[CuckooFilter.MaxVictims]] — never a silent
  * performance cliff on a long crawl.
  *
  * Not thread-safe (mirrors spark BloomFilter usage: one writer task per
  * shard; probes use immutable deserialized copies).
  */
final class CuckooFilter private (
    private val buckets: Array[Short], // nBuckets * SlotsPerBucket slots, 0 = empty
    private val nBuckets: Int,
    private var count: Long,
    /** displaced (bucket, fingerprint) pairs that found no slot */
    private val victims: ArrayBuffer[(Int, Short)]) extends Serializable {

  import CuckooFilter._

  def cardinality: Long = count
  def victimCount: Int = victims.length

  private def fingerprint(key: Long): Short = {
    // fingerprint must never be 0 (0 marks an empty slot)
    val f = ((mix(key) >>> 48) & 0xFFFF).toInt
    (if (f == 0) 1 else f).toShort
  }

  private def bucketOf(key: Long): Int = ((mix(key) & 0x7FFFFFFFL) % nBuckets).toInt

  /** partial-key displacement: the alternate bucket derives from the
    * CURRENT bucket and the fingerprint only, so relocation never needs
    * the original key. (h(f) - b) mod n is an involution:
    * alt(alt(b, f), f) == b.
    */
  private def altBucket(b: Int, f: Short): Int = {
    val h = (mix(f.toLong & 0xFFFFL) & 0x7FFFFFFFL) % nBuckets
    (((h - b) % nBuckets + nBuckets) % nBuckets).toInt
  }

  private def slotBase(b: Int) = b * SlotsPerBucket

  private def tryInsertAt(b: Int, f: Short): Boolean = {
    val base = slotBase(b)
    var i = 0
    while (i < SlotsPerBucket) {
      if (buckets(base + i) == 0) { buckets(base + i) = f; return true }
      i += 1
    }
    false
  }

  def put(key: Long): Unit = {
    val f = fingerprint(key)
    val b1 = bucketOf(key)
    count += 1
    if (tryInsertAt(b1, f) || tryInsertAt(altBucket(b1, f), f)) return
    // displace: bounded eviction walk; park the final homeless fingerprint
    // (with its bucket) in the victim list — NEVER dropped
    var b = altBucket(b1, f)
    var cur = f
    var kicks = 0
    while (kicks < MaxKicks) {
      val base = slotBase(b)
      val slot = kicks % SlotsPerBucket
      val evicted = buckets(base + slot)
      buckets(base + slot) = cur
      cur = evicted
      b = altBucket(b, cur)
      if (tryInsertAt(b, cur)) return
      kicks += 1
    }
    victims += ((b, cur))
    // A growing victim list means the filter is past its design load: every
    // probe degrades to an O(victims) linear scan and the serialized shard
    // grows without bound (bloom only degrades in FPR). Warn once early,
    // then fail fast with a sizing hint rather than silently cliff — a
    // cuckoo table cannot be grown in place (fingerprints lose the key), so
    // the only real fix is resizing at creation.
    if (victims.length == WarnVictims)
      System.err.println(
        s"WARN CuckooFilter: $WarnVictims victims parked at load factor " +
          f"$loadFactor%.2f — undersized for this key volume; probes now scan the victim list")
    if (victims.length > MaxVictims)
      throw new IllegalStateException(
        s"CuckooFilter overloaded: ${victims.length} victims at load factor " +
          f"$loadFactor%.2f ($count keys / ${nBuckets.toLong * SlotsPerBucket} slots). " +
          "Raise CrawlConfig.bloomExpectedPerShard (or shard count), or use " +
          "seenFilterKind=bloom, which degrades only in FPR.")
  }

  /** fraction of slots occupied — sizing diagnostics for the overload guard */
  def loadFactor: Double =
    (count - victims.length).toDouble / (nBuckets.toLong * SlotsPerBucket)

  def mightContain(key: Long): Boolean = {
    val f = fingerprint(key)
    val b1 = bucketOf(key)
    val b2 = altBucket(b1, f)
    containsAt(b1, f) || containsAt(b2, f) ||
      victims.exists { case (vb, vf) => vf == f && (vb == b1 || vb == b2) }
  }

  private def containsAt(b: Int, f: Short): Boolean = {
    val base = slotBase(b)
    var i = 0
    while (i < SlotsPerBucket) {
      if (buckets(base + i) == f) return true
      i += 1
    }
    false
  }

  /** remove ONE occurrence; true if a matching fingerprint was present.
    * The bloom filter cannot do this — the reason the cuckoo option exists.
    */
  def delete(key: Long): Boolean = {
    val f = fingerprint(key)
    val b1 = bucketOf(key)
    val b2 = altBucket(b1, f)
    def del(b: Int): Boolean = {
      val base = slotBase(b)
      var i = 0
      while (i < SlotsPerBucket) {
        if (buckets(base + i) == f) { buckets(base + i) = 0; count -= 1; return true }
        i += 1
      }
      false
    }
    if (del(b1) || del(b2)) return true
    val vi = victims.indexWhere { case (vb, vf) => vf == f && (vb == b1 || vb == b2) }
    if (vi >= 0) { victims.remove(vi); count -= 1; true } else false
  }

  def writeTo(os: java.io.OutputStream): Unit = {
    val d = new java.io.DataOutputStream(os)
    d.writeInt(nBuckets)
    d.writeLong(count)
    d.writeInt(victims.length)
    victims.foreach { case (b, f) => d.writeInt(b); d.writeShort(f) }
    var i = 0
    while (i < buckets.length) { d.writeShort(buckets(i)); i += 1 }
    d.flush()
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  private val MaxKicks = 500
  /** victim count that triggers the one-time undersizing warning */
  val WarnVictims = 16
  /** victim count past which [[CuckooFilter.put]] fails fast (sizing error) */
  val MaxVictims = 1024

  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def create(expectedInsertions: Long): CuckooFilter = {
    // size for ~95% max load
    val n = math.max(16L, expectedInsertions / SlotsPerBucket * 100 / 95 + 1)
    val nb = math.min(n, Int.MaxValue / SlotsPerBucket - 1).toInt
    new CuckooFilter(new Array[Short](nb * SlotsPerBucket), nb, 0L, ArrayBuffer.empty)
  }

  def readFrom(is: java.io.InputStream): CuckooFilter = {
    val d = new java.io.DataInputStream(is)
    val nb = d.readInt()
    val count = d.readLong()
    val nv = d.readInt()
    val victims = ArrayBuffer.tabulate(nv)(_ => { val b = d.readInt(); val f = d.readShort(); (b, f) })
    val arr = new Array[Short](nb * SlotsPerBucket)
    var i = 0
    while (i < arr.length) { arr(i) = d.readShort(); i += 1 }
    new CuckooFilter(arr, nb, count, victims)
  }
}
