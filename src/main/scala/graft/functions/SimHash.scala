package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 64-bit SimHash over whitespace tokens.
  *
  * Bit-identical to the Scala-UDF formulation it replaces (Dedup r2-r5):
  * tokens are maximal runs of non-ASCII-whitespace bytes (the `\s+` split
  * with empties dropped), token hash = low 64 bits of MD5 little-endian
  * (digest bytes 8..15) — the md5_number_lower-reproducible scheme the
  * DuckDB oracle replays — and the sign-vote across the 64 bit positions.
  * A NULL text yields 0L (the UDF's contract), so `nullable = false`.
  * Wins over the UDF: no ScalaUDF input/output conversion, no per-token
  * String allocation — tokens digest straight from the UTF-8 bytes.
  */
object SimHashFns {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  def simhash64(s: UTF8String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes
    val len = bytes.length
    if (len == 0) return 0L
    val md = md5Local.get()
    val counts = new Array[Int](64)
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var h = 0L
        var j = 15
        while (j >= 8) { h = (h << 8) | (d(j) & 0xFFL); j -= 1 }
        var b = 0
        while (b < 64) { counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false // NULL text hashes to 0L, per the UDF contract

  override def eval(input: InternalRow): Any =
    SimHashFns.simhash64(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val value = ctx.freshName("sig")
    val resultCode =
      code"""
        ${childGen.code}
        long $value = graft.functions.SimHashFns.simhash64(
          ${childGen.isNull} ? null : ${childGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode.variable(value, LongType))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  def simhash64(text: Column): Column =
    GraftShims.column(SimHash64(GraftShims.expression(text)))
}
