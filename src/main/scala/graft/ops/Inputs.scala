package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.internal.SQLConf

/** Input-parallelism guard for compute-heavy map passes (guide §2.5 "input
  * skew: one huge unsplittable file … repartition immediately after the
  * read", and §1.2: fix the distributed shape before the per-task work).
  *
  * A small corpus snapshot often arrives as ONE parquet file far under
  * `spark.sql.files.openCostInBytes`-padded split size, so Spark plans a
  * single scan partition — and every fused map pass downstream (shingling,
  * signatures, sha-256 keys, quality regexes) runs on one core, as does the
  * map side of the first partial aggregate. Ops whose first stage is
  * expensive per row route their input through this guard:
  *
  *   - fires ONLY when the scan has fewer partitions than the session
  *     parallelism target AND the optimizer's size estimate says the whole
  *     input would fit in `numShufflePartitions` advisory-sized partitions
  *     (i.e. redistribution costs ~nothing);
  *   - at corpus scale the estimate is large and the scan is already
  *     wide — the guard is a no-op and the text NEVER pays an extra
  *     shuffle (the round-robin exchange exists only in the small regime).
  *
  * Every operator behind this guard is partitioning-independent by the
  * round-6 contract (integer/hash aggregates, full deterministic output
  * orders), so the redistribution cannot change any result.
  */
object Inputs {

  private[graft] def parallelizeSmall(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val parts = conf.numShufflePartitions
    val advisory = math.max(1L, conf.getConf(SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val small =
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(advisory) * parts
    if (small && df.rdd.getNumPartitions < parts) df.repartition(parts) else df
  }
}
