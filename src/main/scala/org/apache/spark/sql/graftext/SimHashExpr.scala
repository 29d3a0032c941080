/** Lives under org.apache.spark.sql so it can use the private[sql]
  * Expression/Column bridge (ExpressionUtils) — same pattern as
  * [[DotProduct]].
  */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Row-local 64-bit SimHash over a token array: each token's xxhash64
  * (seed 42, bit-identical to the builtin `xxhash64(token)`) contributes
  * +1/-1 to 64 bit-position counters; bit i of the result is set iff
  * counter i ends positive.
  *
  * This is the scale-preferred simhash shape: because simhash is a
  * per-document function, computing it inside the row (one loop over the
  * token array) needs NO explode and NO shuffle — `docs.select(doc_id,
  * simhash(tokens))` is a pure map stage, embarrassingly parallel at any
  * corpus size. The aggregate form ([[SimHashAgg]]) remains for inputs
  * that are already exploded to (doc, token_hash) rows (e.g. token
  * tables or streaming accumulation); both produce identical hashes.
  *
  * Codegen: one static-helper call per row inside whole-stage codegen —
  * no per-plan janino blowup (the helper is ordinary JIT-compiled JVM
  * code shared by eval and codegen paths).
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string> tokens, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftext.SimHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHash {

  /** Shared eval/codegen kernel: tight loop, two stack arrays, no
    * allocation beyond the counter array. Null tokens are skipped
    * (matching `xxhash64` on exploded rows where nulls hash to the seed —
    * a null token cannot occur from tokenization, so the branch is
    * defensive). */
  def compute(tokens: ArrayData): Long = {
    val counters = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = XxHash64Function.hash(tokens.getUTF8String(t), StringType, 42L)
        var i = 0
        while (i < 64) {
          counters(i) += (if (((h >>> i) & 1L) != 0L) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var r = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) > 0) r |= (1L << i)
      i += 1
    }
    r
  }

  /** Column-API wrapper: simhash over an array<string> token column. */
  def simhash(tokens: Column): Column =
    ExpressionUtils.column(SimHash(ExpressionUtils.expression(tokens)))
}
