package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused IVF centroid assignment: one compiled pass over the (small,
  * driver-materialized) centroid matrix per vector, returning the list id of
  * the nearest centroid by cosine.
  *
  * This is the MAP-SIDE formulation of the inverted-list build: the
  * crossJoin(broadcast(centroids)) + row_number window alternative shuffles
  * every corpus VECTOR through the window's Exchange on id — a full-corpus
  * shuffle that exists only to pick each row's argmax, computable locally.
  * At retrieval scale (|corpus| ~ 10^10) that Exchange is the whole job; this
  * expression removes it, so corpus vectors never leave their scan tasks
  * until after per-list candidate pruning.
  *
  * Semantics are pinned to the window formulation (and the DuckDB oracle):
  *  - per-centroid cosine = dot(v,c) / (sqrt(dot(v,v)) * sqrt(dot(c,c))),
  *    every sum sequential in index order — bit-identical to the
  *    [[DotProduct]]-based `Similarity.cosine` column;
  *  - ordering = (csim DESC, cid ASC) under Spark's double ordering: NaN
  *    sorts above every real value, -0.0 == 0.0, and a length-mismatched
  *    centroid (NULL cosine) sorts below everything;
  *  - all-NULL/NaN-tie rows take the smallest cid, exactly like the window's
  *    row_number()=1 pick.
  */
object IvfAssignFns {

  /** argmax-cosine list id; `cents` row-major per ASCENDING cid, `norms`
    * the precomputed sqrt(dot(c,c)), `cids` the list ids in the same order
    */
  def assign(v: ArrayData, cents: Array[Array[Double]], norms: Array[Double],
             cids: Array[Long]): Long = {
    val n = v.numElements()
    var sv = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); sv += x * x; i += 1 }
    val normV = math.sqrt(sv)
    var bestIdx = 0
    var bestSim = 0.0
    var bestNull = true // a length-mismatched centroid = NULL cosine, ranks last
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      if (cv.length == n) {
        var acc = 0.0
        var d = 0
        while (d < n) { acc += v.getDouble(d) * cv(d); d += 1 }
        // +0.0 normalizes -0.0 so Double.compare matches Spark's SQL double
        // ordering (NaN greatest, zeros equal); NaN passes through unchanged
        val s = acc / (normV * norms(c)) + 0.0
        if (bestNull || java.lang.Double.compare(s, bestSim) > 0) {
          bestIdx = c; bestSim = s; bestNull = false
        }
      }
      c += 1
    }
    cids(bestIdx)
  }
}

/** `cents`/`cids` are immutable Vectors (not raw arrays) so case-class
  * equality stays structural — plan canonicalization and reuse still match
  * two instances built from the same centroid set.
  */
case class IvfAssign(child: Expression, cents: Vector[Vector[Double]], cids: Vector[Long])
    extends UnaryExpression {
  require(cents.nonEmpty && cents.length == cids.length,
    "IvfAssign needs a non-empty centroid set with one cid per centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_assign requires an array<double> argument, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType

  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val normArr: Array[Double] = centArr.map { cv =>
    var acc = 0.0; var d = 0
    while (d < cv.length) { acc += cv(d) * cv(d); d += 1 }
    math.sqrt(acc)
  }
  @transient private lazy val cidArr: Array[Long] = cids.toArray

  /** default Expression.toString renders every constructor arg — the whole
    * centroid matrix — into plan strings; keep explain output readable
    */
  override def toString: String = s"ivf_assign($child, nlist=${cids.length})"

  override def nullSafeEval(v: Any): Any =
    IvfAssignFns.assign(v.asInstanceOf[ArrayData], centArr, normArr, cidArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centArr, "double[][]")
    val normsRef = ctx.addReferenceObj("norms", normArr, "double[]")
    val cidsRef = ctx.addReferenceObj("cids", cidArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IvfAssignFns.assign($c, $centsRef, $normsRef, $cidsRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfAssign {
  /** map-side nearest-centroid list id; `cents` = (cid, vector) pairs */
  def ivf_assign(vec: Column, cents: Seq[(Long, Array[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    GraftShims.column(IvfAssign(GraftShims.expression(vec),
      sorted.map(_._2.toVector).toVector, sorted.map(_._1).toVector))
  }
}
