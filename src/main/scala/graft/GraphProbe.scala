package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement probe for the round-7 graph-op investigation (not
  * part of any harness; numbers cited in OPTIMIZATION_r07.md).
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.batchSize", "1024")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(body: => Unit): Unit = {
      // warm once, then 3 timed
      body; graft.ops.OpCaches.releaseAll()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ops.OpCaches.releaseAll(); dt
      }
      println(f"== $name%-28s median=${ts.sorted.apply(1)}%.3f  all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }

    def docEdges(): DataFrame = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val n = d.agg(count(lit(1)).as("__N"))
      d.crossJoin(broadcast(n))
        .select(col("doc_id").as("src"),
          explode(array(
            (col("doc_id") * 7 + 1) % col("__N"),
            (col("doc_id") * 13 + 5) % col("__N"),
            (col("doc_id") * 29 + 11) % col("__N"))).as("dst"))
        .distinct()
    }

    def docsTwins(): DataFrame = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      d.unionByName(d.withColumn("doc_id", col("doc_id") + 10000L))
    }
    t("shingle_asis") {
      docsTwins().select(col("doc_id"),
        graft.functions.MinHash.minhash_sig(
          graft.functions.MinHash.shingle_hashes(col("text"), word = true, 3), 128, 42L).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    t("shingle_repart") {
      docsTwins().repartition(32).select(col("doc_id"),
        graft.functions.MinHash.minhash_sig(
          graft.functions.MinHash.shingle_hashes(col("text"), word = true, 3), 128, 42L).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    t("minhash_all_asis")(SparkEntry.queries("qd_dedup_minhash_all")(spark, sfDir).count())
    t("pagerank4")(graft.ops.Graph.pageRank(docEdges(), iters = 4).count())
    t("pagerank6")(graft.ops.Graph.pageRank(docEdges(), iters = 6).count())
    t("pagerank4+join") {
      val pr = graft.ops.Graph.pageRank(docEdges(), iters = 4)
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").as("node"), col("source"))
      pr.join(d, "node").count()
    }
    t("frontier_full")(SparkEntry.queries("qg_frontier_rank")(spark, sfDir).count())
    t("frontier_ckpt") {
      import org.apache.spark.sql.expressions.Window
      val pr = graft.ops.Graph.pageRank(docEdges(), iters = 4).localCheckpoint(true)
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").as("node"), col("source"))
      val w = Window.partitionBy("source").orderBy(col("r").desc, col("node"))
      pr.join(d, "node")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select(col("source"), col("node"), col("r").as("prank"), col("rk").cast("long").as("rk"))
        .orderBy("source", "rk")
        .count()
    }
    t("components16")(SparkEntry.queries("qg_components")(spark, sfDir).count())
    Seq("8", "2").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      t(s"components16_p$p")(SparkEntry.queries("qg_components")(spark, sfDir).count())
      t(s"frontier_p$p")(SparkEntry.queries("qg_frontier_rank")(spark, sfDir).count())
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    val e = docEdges()
    println(s"== docEdges stats sizeInBytes=${e.queryExecution.optimizedPlan.stats.sizeInBytes} rowCount=${e.queryExecution.optimizedPlan.stats.rowCount}")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = d.agg(count(lit(1)).as("__N"))
    val ce = d.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"),
        explode(array((col("doc_id") + 10) % col("__N"),
          (col("doc_id") + 20) % col("__N"))).as("dst"))
    println(s"== ccEdges stats sizeInBytes=${ce.queryExecution.optimizedPlan.stats.sizeInBytes} rowCount=${ce.queryExecution.optimizedPlan.stats.rowCount}")
    val pairs = spark.range(100).selectExpr("id as src", "id+1 as dst")
    println(s"== rangePairs stats sizeInBytes=${pairs.queryExecution.optimizedPlan.stats.sizeInBytes}")
    spark.stop()
  }
}
