package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness — not part of the library surface
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(800).select(col("id").as("doc_id"),
      lit("the exact same duplicated document body shared by every row").as("text"))
      .unionByName(spark.range(800, 1300).select(col("id").as("doc_id"),
        concat(lit("unique text number "), col("id"), lit(" with different words entirely")).as("text")))
    val pairs = graft.ops.Dedup.minhashNearDups(docs, threshold = 0.99)
    val n = pairs.collect().length
    println("[probe] n pairs = " + n)
    println(pairs.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0).take(3000))
    spark.stop()
  }
}
