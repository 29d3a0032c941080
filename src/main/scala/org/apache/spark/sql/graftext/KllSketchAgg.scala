/** Lives under org.apache.spark.sql so it can use the private[sql]
  * Expression/Column bridge (ExpressionUtils) — same pattern as
  * [[ThetaSketchAgg]] and [[FrequentAgg]].
  */
package org.apache.spark.sql.graftext

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** KLL quantiles sketch over a double column (Apache DataSketches) —
  * MERGEABLE approximate quantiles with a proven rank-error bound
  * (~1.65% at the default k=200), the streaming/distributed
  * replacement for exact `percentile` when the value stream no longer
  * fits a sort. Completes the sketch family next to [[FrequentAgg]]
  * (frequency) and [[ThetaSketchAgg]] (distinct/intersection).
  *
  * Scale shape: each partition folds its values into one ~few-KB
  * sketch; partials merge pairwise; nothing value-cardinality-sized
  * shuffles. vs Spark's built-in `approx_percentile` (GK): KLL carries
  * a two-sided rank-error GUARANTEE under arbitrary merge trees and a
  * compact serialized form reusable across window lengths — the same
  * argument as the HLL/theta pairing.
  *
  * Output: the serialized sketch bytes; rank queries live in the
  * companion (domain-sized driver algebra, the theta precedent).
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray()

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray()

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll expects a double input, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_kll"
}

object KllSketchAgg {
  /** Column-API wrapper: KLL quantiles sketch of a double column. */
  def kllSketch(value: Column, k: Int = 200): Column = {
    require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")
    ExpressionUtils.column(
      KllSketchAgg(ExpressionUtils.expression(value), k).toAggregateExpression())
  }

  /** Quantile at `rank` (inclusive criteria — matches SQL
    * percentile_disc-style semantics closely enough for monitoring). */
  def quantile(bytes: Array[Byte], rank: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
      .getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)

  def count(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN
}
