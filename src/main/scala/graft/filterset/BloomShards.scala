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

  def shardCol(urlHash: Column, s: Int): Column = pmod(urlHash, lit(s.toLong)).cast("int")

  private def shardFile(dir: String, shard: Int) = new Path(s"$dir/shard_$shard.bf")

  private def fs(p: Path): FileSystem = p.getFileSystem(new Configuration())

  /** Fold `newHashes` (columns: shard int, urlHash long) into the previous
    * round's shard files, writing the merged filters under `newDir`.
    * One task per touched shard; untouched shards are hard-linked forward by
    * copying references (copy of the small file) so `newDir` is complete.
    */
  def update(spark: SparkSession, newHashes: DataFrame, prevDir: Option[String],
             newDir: String, cfg: CrawlConfig): Unit = {
    import spark.implicits._
    val expected = cfg.bloomExpectedPerShard
    val fpp = cfg.bloomFpp
    val prev = prevDir
    val nd = newDir
    val touched = newHashes
      .select(col("shard"), col("urlHash"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (shard, rows) =>
        val bf = prev.flatMap(d => load(d, shard)).getOrElse(BloomFilter.create(expected, fpp))
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
    // carry untouched shards forward so a probe at round k only needs newDir
    prevDir.foreach { pd =>
      val pdp = new Path(pd)
      val f = fs(pdp)
      if (f.exists(pdp)) f.listStatus(pdp).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("shard_") && name.endsWith(".bf")) {
          val shard = name.stripPrefix("shard_").stripSuffix(".bf").toInt
          if (!touched.contains(shard)) {
            val dst = shardFile(newDir, shard)
            f.mkdirs(dst.getParent)
            org.apache.hadoop.fs.FileUtil.copy(f, st.getPath, f, dst, false, true, new Configuration())
          }
        }
      }
    }
  }

  // JVM-wide probe-side cache: (dir, shard) -> filter. Round dirs are unique
  // paths, so stale entries never alias. LRU-capped: one overflow evicts only
  // the least-recently-used entry, never the whole cache (a clear() would
  // make every in-flight task re-read its shard file).
  private val MaxCached = 256
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Int), BloomFilter](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[(String, Int), BloomFilter]): Boolean =
        size() > MaxCached
    })

  private def load(dir: String, shard: Int): Option[BloomFilter] = {
    val p = shardFile(dir, shard)
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val is = f.open(p)
      try Some(BloomFilter.readFrom(is)) finally is.close()
    }
  }

  private def cached(dir: String, shard: Int): Option[BloomFilter] = {
    val k = (dir, shard)
    Option(cache.get(k)).orElse {
      val bf = load(dir, shard)
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
