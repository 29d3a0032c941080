/** Lives under org.apache.spark.sql so it can use the private[sql]
  * Expression/Column bridge (ExpressionUtils) — same pattern as
  * [[DotProduct]] and [[Shingles]].
  */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native symmetric int8 quantization kernel for the ANN index build:
  * vector → struct(scale: double, q: array<tinyint>) in one row-local
  * pass, inside whole-stage codegen.
  *
  * Replaces the interpreted two-`transform` HOF chain (one pass for
  * maxabs, one for the quantized bytes, each through the lambda
  * interpreter — HOFs never reach codegen, see CLAUDE.md) and is
  * BIT-IDENTICAL to it on non-null FINITE elements:
  *
  *   scale = greatest(array_max(transform(x, v -> abs(double(v)))), 1e-30) / 127
  *   q_i   = cast(floor(double(x_i) / scale + 0.5) as tinyint)
  *
  * floor(x+0.5) round-half-up keeps the values DuckDB-checkable (see
  * Similarity.quantize); |q_i| <= 127 by construction so the cast can
  * never hit the ANSI overflow path. Empty arrays quantize with the
  * 1e-30 floor scale, like `greatest(array_max(empty)=null, 1e-30)`.
  * Null ELEMENTS are rejected (the HOF chain would emit a null byte
  * slot, which a primitive int8 index cannot represent — and a null
  * inside an embedding is an upstream bug, same stance as graft_dot's
  * length check). Non-finite elements are rejected too: the HOF chain
  * also fails the job there (NaN reaches the ANSI tinyint cast), and
  * rejecting explicitly beats silently quantizing garbage.
  */
object Quantize {

  /** Shared by eval and codegen: one pass for maxabs, one for bytes. */
  def int8(arr: ArrayData, floatElems: Boolean): InternalRow = {
    val n = arr.numElements()
    def elem(i: Int): Double = {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        "graft_int8_quantize: null element in embedding — clean the corpus upstream")
      val v = if (floatElems) arr.getFloat(i).toDouble else arr.getDouble(i)
      // the HOF chain this replaces also fails the job on a non-finite
      // element (NaN/Inf reach the ANSI tinyint cast as NaN); reject it
      // explicitly instead of silently shipping garbage bytes
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
        throw new IllegalArgumentException(
          s"graft_int8_quantize: non-finite element $v — clean the corpus upstream")
      v
    }
    var maxabs = 1e-30
    var i = 0
    while (i < n) {
      val v = math.abs(elem(i))
      if (v > maxabs) maxabs = v
      i += 1
    }
    val scale = maxabs / 127.0
    val q = new Array[Byte](n)
    i = 0
    while (i < n) {
      q(i) = math.floor(elem(i) / scale + 0.5).toByte
      i += 1
    }
    new GenericInternalRow(Array[Any](scale, UnsafeArrayData.fromPrimitiveArray(q)))
  }

  /** Column API: vec → struct(scale, q). */
  def int8(vec: Column): Column =
    ExpressionUtils.column(Int8Quantize(ExpressionUtils.expression(vec)))
}

/** vec: array<float|double> → struct(scale: double, q: array<tinyint>). */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  private def floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))

  override def nullSafeEval(input: Any): Any =
    Quantize.int8(input.asInstanceOf[ArrayData], floatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftext.Quantize.int8($c, $floatElems)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_int8_quantize"
}
