/** Lives under org.apache.spark.sql so it can use the private[sql]
  * Expression/Column bridge (ExpressionUtils) — same pattern as
  * [[DotProduct]].
  */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native 64-bit SimHash aggregate: each input token hash contributes
  * +1/-1 to 64 bit-position counters; the final hash sets bit i iff
  * counter i is positive.
  *
  * Why native instead of 64 × `sum(when(...))`: the expression-tree
  * formulation is semantically identical but generates a 64-conditional
  * janino method per aggregation stage — measured ~10 s of one-time
  * codegen COMPILE cost at any data size (the round-2 bench's worst
  * line). This class is one ordinary JVM loop: JIT-compiled, zero
  * per-plan compile cost, and it still participates in map-side partial
  * aggregation (ObjectHashAggregate partial → merge), so the shuffle
  * carries one 256-byte buffer per doc instead of raw tokens — the same
  * scale shape as the tree it replaces.
  *
  * Semantics (bit set iff counter > 0, ties → 0) are bit-identical to
  * the previous formulation; DedupSpec's planted tests pin them.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buffer(i) += (if (((h >>> i) & 1L) != 0L) 1 else -1)
        i += 1
      }
    }
    buffer
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Int]): Any = {
    var r = 0L
    var i = 0
    while (i < 64) {
      if (buffer(i) > 0) r |= (1L << i)
      i += 1
    }
    r
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bytes = new Array[Byte](256)
    java.nio.ByteBuffer.wrap(bytes).asIntBuffer().put(buffer)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](64)
    java.nio.ByteBuffer.wrap(bytes).asIntBuffer().get(out)
    out
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects a bigint token-hash input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHashAgg {
  /** Column-API wrapper: simhash aggregate over a bigint token-hash column. */
  def simhashAgg(tokenHash: Column): Column =
    ExpressionUtils.column(
      SimHashAgg(ExpressionUtils.expression(tokenHash)).toAggregateExpression())
}
