/** Lives under org.apache.spark.sql so it can use the private[sql]
  * Expression/Column bridge (ExpressionUtils) — same pattern as
  * [[VectorFunctions]].
  */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-API access to Spark's built-in bloom-filter sketch expressions
  * (the same machinery Catalyst's InjectRuntimeFilter uses for runtime
  * join pruning), exposed for EXPLICIT membership prefilters.
  *
  * Why this matters at 100 TB: checking "which corpus rows duplicate an
  * already-ingested reference set" as a plain join shuffles the ENTIRE
  * corpus on the join key. With a bloom prefilter the reference set is
  * folded into a ~MB-scale sketch by one distributed
  * TypedImperativeAggregate (partial sketches merged executor-side), the
  * sketch ships to every task as a foldable binary literal, and the
  * corpus is screened map-side by the codegen'd `might_contain` — only
  * the ~|reference|-sized sliver of might-be-members ever reaches the
  * shuffle. False positives are then removed by an exact join on the
  * survivors, so the operator is result-transparent: bloom sizing
  * affects cost, never the answer.
  *
  * kiara analogue: incremental onboarding against an existing data store
  * (/root/reference/src/kiara/registries/data/data_store/__init__.py) —
  * "have I seen this value already" is exactly a membership probe.
  */
object BloomMembership {

  /** Distributed bloom-sketch aggregate over a LongType key column.
    * Returns one BinaryType row (the serialized sketch); NULL on empty
    * input. `numBits` defaults to ~10 bits/item (≈1% fpp), floored so
    * tiny reference sets still get a usable sketch and capped at 2^27
    * bits (16 MB) so the driver/broadcast cost stays bounded no matter
    * how large the reference set claims to be.
    */
  def bloomAgg(keyHash: Column, expectedItems: Long): Column = {
    val bits = math.min(math.max(expectedItems * 10L, 1024L), 1L << 27)
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(keyHash),
      Literal(math.max(expectedItems, 1L)),
      Literal(bits)).toAggregateExpression())
  }

  /** Codegen'd membership probe against a serialized sketch. The sketch
    * side must be foldable (a literal) — pass `lit(bytes)` collected from
    * [[bloomAgg]]'s single output row (bounded by the 16 MB cap above).
    * NULL sketch (empty reference set) probes to NULL, i.e. filters out.
    */
  def mightContain(bloom: Column, keyHash: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom),
      ExpressionUtils.expression(keyHash)))
}
