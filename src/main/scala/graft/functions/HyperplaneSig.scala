package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused random-hyperplane LSH signature (all `nPlanes` sign bits in one
  * compiled pass).
  *
  * The composed formulation — `sum_p when(dot(v, plane_p) >= 0, 1<<p)` —
  * plans as nPlanes separate DotProduct trees: each re-checks null/length,
  * re-walks the vector, and carries its own when/add expression overhead;
  * at tables × nPlanes evaluations per row that overhead dominates the
  * signature pass of the ANN/near-dup ops. This expression computes the
  * whole key in one loop over precomputed plane constants. Per-plane
  * accumulation order is d-ascending — IDENTICAL floating-point sums to the
  * DotProduct formulation, so bucket keys (and therefore every LSH oracle)
  * are bit-for-bit unchanged.
  *
  * A vector whose length differs from `dims` yields key 0 (the composed
  * form's behavior: every per-plane dot is NULL, every when falls to 0).
  */
object HyperplaneSigFns {

  /** deterministic pseudo-random plane component (splitmix64 → [-1,1));
    * THE single source of the constants — the DuckDB oracle SQL generator
    * (SparkEntry) and [[graft.ops.Similarity]] both read it from here
    */
  def planeComponent(seed: Long, plane: Int, dim: Int): Double = {
    var z = seed + plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^= z >>> 31
    z.toDouble / Long.MaxValue.toDouble
  }

  private val planeCache = new ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  /** flattened [p * dims + d] plane matrix, cached per (seed, nPlanes, dims) */
  def planes(seed: Long, nPlanes: Int, dims: Int): Array[Double] =
    planeCache.computeIfAbsent((seed, nPlanes, dims), { case (s, np, nd) =>
      Array.tabulate(np * nd)(i => planeComponent(s, i / nd, i % nd))
    })

  def sig(v: ArrayData, dims: Int, nPlanes: Int, planes: Array[Double]): Long = {
    if (v.numElements() != dims) return 0L
    var key = 0L
    var p = 0
    while (p < nPlanes) {
      val off = p * dims
      var acc = 0.0
      var d = 0
      while (d < dims) { acc += v.getDouble(d) * planes(off + d); d += 1 }
      if (acc >= 0) key |= 1L << p
      p += 1
    }
    key
  }
}

case class HyperplaneSig(child: Expression, dims: Int, nPlanes: Int, seed: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_sig requires an array<double> argument, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType

  @transient private lazy val planeArr: Array[Double] =
    HyperplaneSigFns.planes(seed, nPlanes, dims)

  override def nullSafeEval(v: Any): Any =
    HyperplaneSigFns.sig(v.asInstanceOf[ArrayData], dims, nPlanes, planeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planeArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneSigFns.sig($c, $dims, $nPlanes, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {
  def hyperplane_sig(vec: Column, dims: Int, nPlanes: Int, seed: Long): Column =
    GraftShims.column(HyperplaneSig(GraftShims.expression(vec), dims, nPlanes, seed))
}
