package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL registration for the custom Catalyst expressions, so `spark.sql`
  * users get them alongside the Column API:
  *
  *   SELECT graft_dot_product(a, b)                 -- array<double> x2
  *   SELECT graft_shingle_hashes(text, true, 3)     -- word 3-shingles
  *   SELECT graft_minhash_sig(hashes, 128, 42)      -- signature
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$name must be an int literal, got $other")
  }
  private def boolArg(e: Expression, name: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(s"$name must be a boolean literal, got $other")
  }
  private def longArg(e: Expression, name: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$name must be a long literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot_product",
      es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      es => ShingleHashes(es(0), boolArg(es(1), "word"), intArg(es(2), "k")), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      es => MinHashSig(es(0), intArg(es(1), "numHashes"), longArg(es(2), "seed")), "built-in")
  }
}
