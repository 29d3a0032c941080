/** Lives under org.apache.spark.sql so it can use the private[sql]
  * Expression/Column bridge (ExpressionUtils) — same pattern as
  * [[DotProduct]] and [[SimHash]].
  */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Row-local k-gram hashing kernels for dedup/fingerprinting.
  *
  * Both expressions replace interpreted higher-order-function chains
  * (`transform(sequence(...), i -> xxhash64(...))` — HOFs never reach
  * whole-stage codegen, see CLAUDE.md) with one tight JVM loop per row,
  * and both are BIT-IDENTICAL to the builtin chains they replace: every
  * hash goes through the same XXH64 primitives the `xxhash64` builtin
  * uses (seed 42, sequential accumulator), so oracle-verified outputs
  * are unchanged.
  *
  * [[MinHashSig]] goes further than hashing: it computes the ENTIRE
  * minhash signature inside the row. The previous plan exploded shingle
  * hashes and re-aggregated 32 mins per doc — a full shuffle of the
  * shingle stream. A minhash signature is a per-document function, so
  * the scale-correct shape is a pure map stage: no explode, no shuffle,
  * embarrassingly parallel at any corpus size (the kiara-mirrored dedup
  * capability, reference modules' tables/dedup surface).
  */
object Shingles {

  private val Seed = 42L

  /** Hash of one token: identical to the builtin `xxhash64(token)` —
    * including the null case, where the builtin leaves the seed
    * untouched (defensive: tokenization never emits null tokens). */
  private def tokenHash(tokens: ArrayData, i: Int): Long =
    if (tokens.isNullAt(i)) Seed
    else XxHash64Function.hash(tokens.getUTF8String(i), StringType, Seed)

  /** Minhash signature of a token array — bit-identical to:
    * th = transform(toks, t -> xxhash64(t));
    * shingles = transform(sequence(0, n-k), i -> xxhash64(th[i+1..i+k]));
    * h1 = xxhash64(s); h2 = xxhash64(s, 1);   // per shingle
    * sig[i] = min(h1 xor rotl(h2, i)).
    * (`array_distinct` in the old chain is a no-op under min.) */
  def minhashSig(tokens: ArrayData, k: Int, numHashes: Int): ArrayData = {
    val n = tokens.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    if (n >= k) {
      // token hashes once; shingle p covers th[p .. p+k-1]
      val th = new Array[Long](n)
      var i = 0
      while (i < n) { th(i) = tokenHash(tokens, i); i += 1 }
      var p = 0
      while (p <= n - k) {
        var sh = Seed
        var j = p
        while (j < p + k) { sh = XXH64.hashLong(th(j), sh); j += 1 }
        val h1 = XXH64.hashLong(sh, Seed)
        val h2 = XXH64.hashInt(1, XXH64.hashLong(sh, Seed)) // = xxhash64(s, 1)
        var b = 0
        while (b < numHashes) {
          val rot = if (b == 0) h2 else (h2 << b) | (h2 >>> (64 - b))
          val v = h1 ^ rot
          if (v < sig(b)) sig(b) = v
          b += 1
        }
        p += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Winnowing fingerprints of a token array — bit-identical to:
    * th = transform(sequence(0, n-k), i -> xxhash64(tok[i+1..i+k]));
    * array_distinct(transform(sequence(0, m-w), i ->
    *   array_min(slice(th, i+1, w)))) — k-gram hashes go over the token
    * STRINGS sequentially (not token hashes), matching the builtin
    * `xxhash64(tok_1, ..., tok_k)`; distinct keeps first occurrence. */
  def winnowFps(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k + w - 1) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val m = n - k + 1 // number of k-gram hashes
    val th = new Array[Long](m)
    var p = 0
    while (p < m) {
      var sh = Seed
      var j = p
      while (j < p + k) {
        // null child leaves the accumulator unchanged, like the builtin
        if (!tokens.isNullAt(j))
          sh = XxHash64Function.hash(tokens.getUTF8String(j), StringType, sh)
        j += 1
      }
      th(p) = sh
      p += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= m - w) {
      var mn = th(i)
      var j = i + 1
      while (j < i + w) { if (th(j) < mn) mn = th(j); j += 1 }
      out.add(mn)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  /** Positional k-gram hashes: gram p covers tokens[p .. p+k-1]; output
    * index IS the gram position (no winnowing, no dedup) — the input to
    * span-level analyses that need to know WHERE a gram sits, not just
    * that it exists. Bit-identical to winnowFps's internal hash stream.
    */
  def gramHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val m = n - k + 1
    val th = new Array[Long](m)
    var p = 0
    while (p < m) {
      var sh = Seed
      var j = p
      while (j < p + k) {
        if (!tokens.isNullAt(j))
          sh = XxHash64Function.hash(tokens.getUTF8String(j), StringType, sh)
        j += 1
      }
      th(p) = sh
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(th)
  }

  /** Column API: full minhash signature (array<long> of `numHashes`). */
  def minhashSig(tokens: Column, k: Int, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSig(ExpressionUtils.expression(tokens), k, numHashes))

  /** Column API: distinct winnowing fingerprints (array<long>). */
  def winnowFps(tokens: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(
      WinnowFps(ExpressionUtils.expression(tokens), k, w))

  /** Column API: positional k-gram hashes (array<long>, index = pos). */
  def gramHashes(tokens: Column, k: Int): Column =
    ExpressionUtils.column(
      GramHashes(ExpressionUtils.expression(tokens), k))
}

private[graftext] trait TokenArrayExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> tokens, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
}

/** Positional k-gram hash stream: tokens → array<long>, index = gram
  * position. Row-local and codegen'd like its siblings. */
case class GramHashes(child: Expression, k: Int)
    extends TokenArrayExpr {
  require(k > 0, s"bad gram size k=$k")

  override def nullSafeEval(input: Any): Any =
    Shingles.gramHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftext.Shingles.gramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_gram_hashes"
}

/** Whole-signature minhash: tokens → array<long> of `numHashes` minima.
  * One static-helper call per row inside whole-stage codegen. */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends TokenArrayExpr {
  require(k > 0 && numHashes > 0, s"bad minhash params k=$k numHashes=$numHashes")

  override def nullSafeEval(input: Any): Any =
    Shingles.minhashSig(input.asInstanceOf[ArrayData], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftext.Shingles.minhashSig($c, $k, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

/** Winnowing fingerprint set: tokens → array<long> of distinct window
  * minima (first-occurrence order), Schleimer et al. selection. */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends TokenArrayExpr {
  require(k > 0 && w > 0, s"bad winnowing params k=$k w=$w")

  override def nullSafeEval(input: Any): Any =
    Shingles.winnowFps(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftext.Shingles.winnowFps($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow_fps"
}
