package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness — not part of the library surface
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.inMemoryColumnarStorage.batchSize", "1024")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[probe] chooseBands(128,0.95)=" + graft.ops.Dedup.chooseBands(128, 0.95)
      + " (128,0.7)=" + graft.ops.Dedup.chooseBands(128, 0.7)
      + " (64,0.95)=" + graft.ops.Dedup.chooseBands(64, 0.95)
      + " (64,0.6)=" + graft.ops.Dedup.chooseBands(64, 0.6))
    val dir = "/root/testdata/sf0.1"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val twins = d.unionByName(d.withColumn("doc_id", col("doc_id") + 10000L))
    def time[T](n: String)(b: => T): T = { val t0 = System.nanoTime(); val r = b; println(f"[probe] $n: ${(System.nanoTime()-t0)/1e9}%.2fs"); r }
    val full = graft.ops.Dedup.minhashNearDups(twins, threshold = 0.7)
    time("minhash_all 0.7")(println("[probe] minhash pairs = " + full.count()))
    val fullN = graft.ops.Dedup.ngramJaccardNearDups(twins, threshold = 0.95)
    time("ngram 0.95 all")(println("[probe] ngram pairs = " + fullN.count()))
    val tw = graft.ops.Dedup.ngramJaccardNearDups(twins, threshold = 0.95).filter(col("b") === col("a") + 10000L)
    time("ngram 0.95 twins")(println("[probe] ngram twin pairs = " + tw.count()))
    spark.stop()
  }
}
