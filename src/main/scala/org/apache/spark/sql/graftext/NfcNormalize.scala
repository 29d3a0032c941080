/** Lives under org.apache.spark.sql so it can use the private[sql]
  * Expression/Column bridge (ExpressionUtils) — same pattern as
  * [[DotProduct]] and [[SimHash]].
  */
package org.apache.spark.sql.graftext

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization step a text-dedup pipeline runs BEFORE fingerprinting
  * so that composed ("é") and decomposed ("e" + U+0301) spellings of the
  * same text hash identically. Spark ships no normalization builtin; a
  * Scala UDF would serialize per row — this expression is one static
  * call inside whole-stage codegen with an ASCII fast path (the common
  * case at corpus scale: zero allocation, no Normalizer invocation).
  *
  * Semantics match DuckDB's `nfc_normalize`, which is the DuckDB oracle
  * for the registered `text_nfc` query.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftext.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {

  /** Shared eval/codegen kernel. ASCII bytes are unaffected by NFC, so a
    * pure-ASCII string returns unchanged without leaving UTF8String land;
    * otherwise normalize through java.text.Normalizer (ICU-equivalent
    * for NFC on the BMP sequences that occur in text corpora). */
  def compute(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** Column-API wrapper: NFC-normalize a string column. */
  def nfc(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))
}
