package graft.filterset

import graft.model.CrawlConfig
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Partitioned bloom URL-seen pre-filter (BASELINE.json:14 "partitioned
  * bloom/cuckoo URL-seen structure"; sizing heuristics per PAPERS.md bloom
  *-collection work).
  *
  * Design for 10^10 URLs: the seen set cannot be one broadcastable filter
  * (~12 GB at 1% FPR), so it is sharded by `pmod(xxhash64(url), S)`. Each
  * round, one task per shard folds that shard's newly-seen urlHashes into
  * the previous round's shard file (Hadoop FileSystem API — local FS in the
  * sandbox, HDFS/S3 on a cluster, same code). Probing tasks lazily load and
  * JVM-cache only the shards they touch — nothing is collected to the
  * driver and no filter bytes travel row-wise through a join.
  *
  * Exactness: the bloom answers only "definitely unseen" — those rows skip
  * the exact anti-join; "maybe seen" rows still go through it, so the seen
  * set stays exact (BASELINE.json:6) with zero false drops. Hashes (not raw
  * urls) are inserted: if url ∈ seen then its xxhash64 is in the filter, so
  * no false "definitely unseen" is possible.
  */
object BloomShards extends Serializable {

  /** Per-shard filter abstraction: bloom (default) or cuckoo
    * (cfg.seenFilterKind = "cuckoo" — deletable, better FPR/bit at load;
    * see [[CuckooFilter]]). Both honor the ZERO-false-negative contract the
    * pre-filter shortcut depends on. Shard files are self-describing (one
    * tag byte), so probes need no config.
    */
  private[filterset] sealed trait SeenFilter {
    def putLong(h: Long): Unit
    def mightContainLong(h: Long): Boolean
    def writeTo(os: java.io.OutputStream): Unit
  }
  private final class BloomSeen(val bf: BloomFilter) extends SeenFilter {
    def putLong(h: Long): Unit = bf.putLong(h)
    def mightContainLong(h: Long): Boolean = bf.mightContainLong(h)
    def writeTo(os: java.io.OutputStream): Unit = { os.write(0); bf.writeTo(os) }
  }
  private final class CuckooSeen(val cf: CuckooFilter) extends SeenFilter {
    def putLong(h: Long): Unit = cf.put(h)
    def mightContainLong(h: Long): Boolean = cf.mightContain(h)
    def writeTo(os: java.io.OutputStream): Unit = { os.write(1); cf.writeTo(os) }
  }
  private def createFilter(kind: String, expected: Long, fpp: Double): SeenFilter =
    kind match {
      case "cuckoo" => new CuckooSeen(CuckooFilter.create(expected))
      case _ => new BloomSeen(BloomFilter.create(expected, fpp))
    }
  /** Self-describing read with legacy detection. Tagged streams start with
    * one tag byte (0 = bloom, 1 = cuckoo). Legacy shard files (pre-tag code
    * wrote `bf.writeTo` directly — the bootstrap layout readShardMap still
    * accepts) start with Spark BloomFilter's big-endian version int
    * (1 in Spark <4, 2 in Spark 4's V2 format — verified against this
    * classpath), so the first FOUR bytes disambiguate: (0,0,0,1)/(0,0,0,2)
    * can only be an untagged bloom stream — a tagged bloom reads (0,0,0,0)
    * there (tag 0 + the version int's three leading zero bytes) and a
    * tagged cuckoo reads (1, nBuckets-high-bytes...), i.e. starts with 1.
    */
  private def readFilter(is0: java.io.InputStream): SeenFilter = {
    val is = new java.io.PushbackInputStream(is0, 4)
    val head = new Array[Byte](4)
    var n = 0
    while (n < 4) {
      val r = is.read(head, n, 4 - n)
      if (r < 0) throw new java.io.EOFException(s"truncated seen-filter stream ($n header bytes)")
      n += r
    }
    if (head(0) == 0 && head(1) == 0 && head(2) == 0 && (head(3) == 1 || head(3) == 2)) {
      is.unread(head) // legacy untagged Spark bloom stream
      new BloomSeen(BloomFilter.readFrom(is))
    } else {
      is.unread(head, 1, 3) // consume the tag byte, restore the rest
      head(0) match {
        case 1 => new CuckooSeen(CuckooFilter.readFrom(is))
        case 0 => new BloomSeen(BloomFilter.readFrom(is))
        case t => throw new java.io.IOException(s"unknown seen-filter tag byte $t")
      }
    }
  }

  def shardCol(urlHash: Column, s: Int): Column = pmod(urlHash, lit(s.toLong)).cast("int")

  private def shardFile(dir: String, shard: Int) = new Path(s"$dir/shard_$shard.bf")

  private def fs(p: Path): FileSystem = p.getFileSystem(new Configuration())

  // ---- shard map: per round dir, a tiny manifest mapping shard -> the dir
  // that holds its LATEST filter file. Untouched shards are carried forward
  // by REFERENCE, never by copying the MB-sized filter files (the old
  // copy-forward cost cfg.shards driver-side file copies every round — pure
  // fixed per-round overhead).
  private def mapFile(dir: String) = new Path(s"$dir/_shards.json")

  private def readShardMap(dir: String): Map[Int, String] = {
    val p = mapFile(dir)
    val f = fs(p)
    if (!f.exists(p)) {
      // bootstrap layout: whatever shard files exist directly in dir
      val d = new Path(dir)
      if (!f.exists(d)) Map.empty
      else f.listStatus(d).map(_.getPath.getName)
        .collect { case n if n.startsWith("shard_") && n.endsWith(".bf") =>
          n.stripPrefix("shard_").stripSuffix(".bf").toInt -> dir }
        .toMap
    } else {
      val is = f.open(p)
      val body = try scala.io.Source.fromInputStream(is, "UTF-8").mkString finally is.close()
      """"(\d+)":"([^"]*)"""".r.findAllMatchIn(body)
        .map(m => m.group(1).toInt -> m.group(2)).toMap
    }
  }

  private def writeShardMap(dir: String, m: Map[Int, String]): Unit = {
    val p = mapFile(dir)
    val f = fs(p)
    f.mkdirs(p.getParent)
    val tmp = new Path(p.toString + ".tmp")
    val os = f.create(tmp, true)
    try os.write(m.map { case (s, d) => s""""$s":"$d"""" }.mkString("{", ",", "}").getBytes("UTF-8"))
    finally os.close()
    f.delete(p, false)
    f.rename(tmp, p)
  }

  /** Fold `newHashes` (columns: shard int, urlHash long) into the previous
    * round's shard filters: merged filters for TOUCHED shards are written
    * under `newDir` (one task per touched shard); untouched shards carry
    * forward by reference in the shard map.
    */
  def update(spark: SparkSession, newHashes: DataFrame, prevDir: Option[String],
             newDir: String, cfg: CrawlConfig): Unit = {
    import spark.implicits._
    val expected = cfg.bloomExpectedPerShard
    val fpp = cfg.bloomFpp
    val kind = cfg.seenFilterKind
    val prevMap: Map[Int, String] = prevDir.map(readShardMap).getOrElse(Map.empty)
    val nd = newDir
    val touched = newHashes
      .select(col("shard"), col("urlHash"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (shard, rows) =>
        val bf = prevMap.get(shard).flatMap(d => load(d, shard))
          .getOrElse(createFilter(kind, expected, fpp))
        var n = 0L
        rows.foreach { r => bf.putLong(r._2); n += 1 }
        val out = shardFile(nd, shard)
        val f = fs(out)
        f.mkdirs(out.getParent)
        val tmp = new Path(out.toString + ".tmp")
        val os = f.create(tmp, true)
        try bf.writeTo(os) finally os.close()
        f.delete(out, false)
        f.rename(tmp, out)
        (shard, n)
      }
      .collect()
      .map(_._1)
      .toSet
    writeShardMap(newDir, prevMap ++ touched.map(_ -> newDir))
  }

  // JVM-wide probe-side cache: (dir, shard) -> filter. Round dirs are unique
  // paths, so stale entries never alias. LRU-capped: one overflow evicts only
  // the least-recently-used entry, never the whole cache (a clear() would
  // make every in-flight task re-read its shard file).
  private val MaxCached = 256
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Int), SeenFilter](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[(String, Int), SeenFilter]): Boolean =
        size() > MaxCached
    })

  private def load(dir: String, shard: Int): Option[SeenFilter] = {
    val p = shardFile(dir, shard)
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val is = f.open(p)
      try Some(readFilter(is)) finally is.close()
    }
  }

  // probe-side shard-map cache (tiny: a Map[Int,String] per round dir)
  private val mapCache = new java.util.concurrent.ConcurrentHashMap[String, Map[Int, String]]()

  private def cached(dir: String, shard: Int): Option[SeenFilter] = {
    val k = (dir, shard)
    Option(cache.get(k)).orElse {
      val m = mapCache.computeIfAbsent(dir, readShardMap(_))
      val bf = m.get(shard).flatMap(load(_, shard))
      bf.foreach(b => cache.put(k, b))
      bf
    }
  }

  /** Column predicate: true iff the shard filter *might* contain the hash
    * (missing shard file => nothing seen in that shard => false).
    */
  def mightBeSeen(dir: String)(shard: Column, urlHash: Column): Column = {
    val f = udf((s: Int, h: Long) => cached(dir, s).exists(_.mightContainLong(h)))
    f(shard, urlHash)
  }
}
