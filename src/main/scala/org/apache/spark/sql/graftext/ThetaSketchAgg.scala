/** Lives under org.apache.spark.sql so it can use the private[sql]
  * Expression/Column bridge (ExpressionUtils) — same pattern as
  * [[DotProduct]], [[SimHashAgg]], and [[FrequentAgg]].
  */
package org.apache.spark.sql.graftext

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Theta-sketch distinct-set summary over a long key column (Apache
  * DataSketches). Unlike HLL (union-only), theta sketches support set
  * INTERSECTION and DIFFERENCE with bounded error — the machinery
  * behind "how many users did A *and* B" (audience overlap) when the
  * exact distinct-pair join is the thing that doesn't scale.
  *
  * Scale shape: each partition folds its keys into one fixed-size
  * sketch (≤ 2^lgK retained hashes — 32 KB at the default lgK=12);
  * partials merge pairwise through the union operator; nothing
  * key-cardinality-sized is ever shuffled or collected. Below ~2^lgK
  * distinct keys the sketch is in exact mode (it retains every hash),
  * so small-scale estimates are exactly the true counts — which is
  * what lets the gate oracle-check the overlap query at sf0.01 while
  * the same code degrades gracefully to (deterministic) estimates at
  * 100 TB.
  *
  * Output: the compact sketch bytes (BinaryType). Driver-side algebra
  * (estimate / intersect / union) lives in the companion — pairing
  * sketches is domain-sized work, never data-sized.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult())
    a
  }

  override def eval(buffer: Union): Any = buffer.getResult().toByteArray()

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult().toByteArray()

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.heapifyCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_theta expects a bigint input, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_theta"
}

object ThetaSketchAgg {
  /** Column-API wrapper: theta sketch of a long key column. */
  def thetaSketch(key: Column, lgK: Int = 12): Column = {
    require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")
    ExpressionUtils.column(
      ThetaSketchAgg(ExpressionUtils.expression(key), lgK).toAggregateExpression())
  }

  private def heapify(bytes: Array[Byte]) =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes))

  /** Distinct-count estimate (exact while the sketch is in exact mode). */
  def estimate(bytes: Array[Byte]): Double = heapify(bytes).getEstimate

  /** |A ∩ B| estimate via the intersection operator. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(heapify(a))
    i.intersect(heapify(b))
    i.getResult().getEstimate
  }

  /** |A ∪ B| estimate via the union operator. */
  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val u = SetOperation.builder().buildUnion()
    u.union(heapify(a))
    u.union(heapify(b))
    u.getResult().getEstimate
  }
}
