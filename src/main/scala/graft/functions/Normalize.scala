package graft.functions

import java.text.{Normalizer => JNormalizer}

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen-friendly Catalyst expression.
  *
  * Web-crawled text arrives in mixed normalization forms (decomposed
  * accents from macOS uploads, legacy CMS output, copy-paste chains);
  * canonical composition is the standard first pass of a webtext
  * cleaning pipeline so that dedup hashes, shingles and token counts see
  * one byte representation per logically-identical string. Spark has no
  * built-in for this; a Scala UDF would pay input/output conversion on
  * every row of a 100-TB corpus. This expression calls
  * `java.text.Normalizer` (the JDK's Unicode implementation — the same
  * algorithm DuckDB's `nfc_normalize` implements via utf8proc, which is
  * how the cross-engine oracle pins it) directly on the column value via
  * a static call that whole-stage codegen inlines.
  *
  * Fast path: `Normalizer.isNormalized` is a single scan with no
  * allocation, and real-world corpora are overwhelmingly already-NFC —
  * the common row never allocates a new string, and ASCII short-circuits
  * inside the JDK check.
  */
object NormalizeFns {
  def nfc(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (JNormalizer.isNormalized(str, JNormalizer.Form.NFC)) s
    else UTF8String.fromString(JNormalizer.normalize(str, JNormalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeFns.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeFns.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Normalize {
  def nfc(text: Column): Column =
    GraftShims.column(NfcNormalize(GraftShims.expression(text)))
}
