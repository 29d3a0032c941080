/** Lives under org.apache.spark.sql with the other graft extensions. */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the interpreted higher-order-function
  * dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[DotProduct]] expression. The HOF chain
  * allocates an intermediate product array per row and runs in the
  * interpreted lambda machinery (never whole-stage codegen — see
  * CLAUDE.md); the rewrite is the difference between an interpreted and
  * a compiled inner loop on billions of candidate pairs.
  *
  * Semantics are preserved exactly, including the HOF edge cases:
  * DotProduct widens each element to double and accumulates
  * left-to-right — what the matched shape computes for non-null
  * equal-length inputs (IEEE multiplication commutes, so
  * `(x, y) -> y * x` matches too). For MISMATCHED lengths the HOF
  * returns NULL (zip_with pads with nulls, the sum propagates them),
  * where DotProduct would throw — so the rewrite wraps the dot in a
  * size-equality guard that yields NULL instead. Arrays whose elements
  * may themselves be null (`containsNull`) are NOT rewritten at all: a
  * null element makes the HOF return NULL, which a primitive-array dot
  * cannot reproduce. Anything but this canonical double-typed shape is
  * left untouched.
  *
  * Installed either through [[GraftExtensions]]
  * (`spark.sql.extensions=org.apache.spark.sql.graftext.GraftExtensions`)
  * or on a live session via
  * `spark.experimental.extraOptimizations ++= Seq(RewriteHofDot)`.
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  // element nulls would make the HOF chain return NULL; a primitive dot
  // cannot reproduce that, so nullable-element arrays are not rewritten
  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  /** `(x, y) -> x * y` over the zip vars, either operand order. */
  private def isElementProduct(f: Expression, vars: Seq[NamedLambdaVariable]): Boolean =
    f match {
      case Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
        vars.map(_.exprId).toSet == Set(l.exprId, r.exprId)
      case _ => false
    }

  /** `(acc, v) -> acc + v` over the aggregate vars, either order. */
  private def isSum(f: Expression, vars: Seq[NamedLambdaVariable]): Boolean =
    f match {
      case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
        vars.map(_.exprId).toSet == Set(l.exprId, r.exprId)
      case _ => false
    }

  /** identity finish `acc -> acc` (what 3-arg aggregate() defaults to). */
  private def isIdentity(f: Expression, vars: Seq[NamedLambdaVariable]): Boolean =
    (f, vars) match {
      case (v: NamedLambdaVariable, Seq(a)) => v.exprId == a.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(prod, zipVars: Seq[_], _)),
            Literal(0.0, DoubleType),
            LambdaFunction(merge, aggVars: Seq[_], _),
            LambdaFunction(finish, finVars: Seq[_], _))
          // a/b are duplicated into the Size guard and DotProduct, which
          // is only sound when re-evaluation yields the same array —
          // standard Catalyst practice when copying subexpressions
          if a.deterministic && b.deterministic &&
            doubleArray(a) && doubleArray(b) &&
            isElementProduct(prod, zipVars.asInstanceOf[Seq[NamedLambdaVariable]]) &&
            isSum(merge, aggVars.asInstanceOf[Seq[NamedLambdaVariable]]) &&
            isIdentity(finish, finVars.asInstanceOf[Seq[NamedLambdaVariable]]) =>
        // size guard preserves the HOF's NULL-on-length-mismatch (where
        // DotProduct would throw); Size(_, false) is null for null input,
        // routing null arrays to the else branch = NULL, same as the HOF
        If(EqualTo(Size(a, legacySizeOfNull = false), Size(b, legacySizeOfNull = false)),
          DotProduct(a, b), Literal.create(null, DoubleType))
    }

  /** Convenience installer for an existing session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDot))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDot
}
