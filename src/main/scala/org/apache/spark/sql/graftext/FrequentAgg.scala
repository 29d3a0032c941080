/** Lives under org.apache.spark.sql so it can use the private[sql]
  * Expression/Column bridge (ExpressionUtils) — same pattern as
  * [[DotProduct]] and [[SimHashAgg]].
  */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch over a string column — the
  * one-pass heavy-hitter summary (capacity `m` counters) with the
  * classic deterministic guarantee: any item NOT in the sketch has true
  * count ≤ `debt`, and every tracked item's true count lies in
  * [cnt, cnt + debt]. `debt` is the number of decrement events the
  * stream absorbed (≤ N/(m+1) on a length-N stream, and the merge rule
  * keeps the bound valid across partials — Agarwal et al., "Mergeable
  * Summaries", PODS '12).
  *
  * Scale shape: this is what replaces `groupBy(term).count().orderBy`
  * when the term cardinality itself is the problem — each partition
  * reduces its token stream to one `m`-entry buffer map-side, partials
  * merge pairwise, and nothing the size of the vocabulary is ever
  * shuffled or collected. The decrement ("debt") bookkeeping uses a
  * global offset instead of touching all m counters, so update is O(1)
  * amortized: entries with cnt ≤ debt are dead and reaped in periodic
  * sweeps; between sweeps a saturated map over-counts debt slightly,
  * which only WIDENS the error bound (never invalidates it).
  *
  * Output: struct(items: array<struct<term,cnt>>, debt: long) where cnt
  * is the guaranteed UNDERestimate. Callers wanting exactness run a
  * second exact pass over the returned candidates and check the
  * threshold `kth-count > debt` (see TextOps.heavyHitters).
  */
final class MgSketch(val capacity: Int) {
  val counts = new java.util.HashMap[String, Array[Long]]()
  var debt = 0L
  private var sweepCooldown = 0

  private def sweep(): Int = {
    val it = counts.entrySet().iterator()
    var removed = 0
    while (it.hasNext) {
      if (it.next().getValue()(0) <= debt) { it.remove(); removed += 1 }
    }
    removed
  }

  def add(term: String): Unit = {
    val c = counts.get(term)
    if (c != null) { c(0) += 1L; return }
    if (counts.size < capacity) {
      counts.put(term, Array(debt + 1L)); return
    }
    // physically full: try to reap dead entries, but at most every
    // capacity/4 events — skipped sweeps count as decrements, which is
    // conservative (inflates debt, keeps the bound an upper bound)
    if (sweepCooldown == 0) {
      sweepCooldown = capacity / 4
      if (sweep() > 0) { counts.put(term, Array(debt + 1L)); return }
    } else sweepCooldown -= 1
    debt += 1L
  }

  /** Live entries as (term, guaranteed-underestimate count). */
  def live(): Seq[(String, Long)] = {
    val b = Seq.newBuilder[(String, Long)]
    counts.forEach((t, c) => if (c(0) > debt) b += ((t, c(0) - debt)))
    b.result()
  }
}

case class FrequentAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): MgSketch = new MgSketch(capacity)

  override def update(buffer: MgSketch, input: InternalRow): MgSketch = {
    val v = child.eval(input)
    // UTF8String buffers are reused by the scan: materialize to String
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  /** Mergeable-summaries rule: union-sum the effective counts under the
    * summed debt, then if over capacity subtract the (m+1)-th largest
    * effective count from everything (adding it to debt) and keep the
    * strictly-positive remainder — at most m entries survive. */
  override def merge(a: MgSketch, b: MgSketch): MgSketch = {
    val eff = new java.util.HashMap[String, Array[Long]]()
    a.counts.forEach((t, c) => if (c(0) > a.debt) eff.put(t, Array(c(0) - a.debt)))
    b.counts.forEach { (t, c) =>
      if (c(0) > b.debt) {
        val e = eff.get(t)
        if (e != null) e(0) += c(0) - b.debt else eff.put(t, Array(c(0) - b.debt))
      }
    }
    var extraDebt = 0L
    if (eff.size > capacity) {
      val vals = new Array[Long](eff.size)
      var i = 0
      eff.forEach((_, c) => { vals(i) = c(0); i += 1 })
      java.util.Arrays.sort(vals)
      extraDebt = vals(vals.length - capacity - 1) // (m+1)-th largest
    }
    val out = new MgSketch(capacity)
    out.debt = a.debt + b.debt + extraDebt
    eff.forEach((t, c) =>
      if (c(0) > extraDebt) out.counts.put(t, Array(c(0) - extraDebt + out.debt)))
    out
  }

  override def eval(buffer: MgSketch): Any = {
    val items = buffer.live().sortBy { case (t, c) => (-c, t) }.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(items.toArray[Any]), buffer.debt))
  }

  override def serialize(buffer: MgSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buffer.debt)
    out.writeInt(buffer.counts.size)
    buffer.counts.forEach { (t, c) =>
      val tb = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(tb.length); out.write(tb); out.writeLong(c(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSketch = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val sk = new MgSketch(capacity)
    sk.debt = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](in.readInt()); in.readFully(tb)
      sk.counts.put(new String(tb, java.nio.charset.StandardCharsets.UTF_8),
        Array(in.readLong()))
      i += 1
    }
    sk
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_frequent expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("debt", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FrequentAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_frequent"
}

object FrequentAgg {
  /** Column-API wrapper: Misra-Gries frequent-items sketch with
    * `capacity` counters over a string column. */
  def frequentSketch(term: Column, capacity: Int): Column = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    ExpressionUtils.column(
      FrequentAgg(ExpressionUtils.expression(term), capacity).toAggregateExpression())
  }
}
