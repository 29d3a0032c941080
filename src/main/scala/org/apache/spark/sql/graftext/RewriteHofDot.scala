/** Lives under org.apache.spark.sql with the other graft extensions. */
package org.apache.spark.sql.graftext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType}

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
  * Semantics: DotProduct widens each element to double and accumulates
  * left-to-right — exactly what the matched shape computes when the
  * products are double-typed, so the rewrite is bit-identical (IEEE
  * multiplication is commutative, so `(x, y) -> y * x` matches too).
  * Only the canonical double-typed shape is rewritten; anything else is
  * left untouched.
  *
  * Installed either through [[GraftExtensions]]
  * (`spark.sql.extensions=org.apache.spark.sql.graftext.GraftExtensions`)
  * or on a live session via
  * `spark.experimental.extraOptimizations ++= Seq(RewriteHofDot)`.
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
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
          if doubleArray(a) && doubleArray(b) &&
            isElementProduct(prod, zipVars.asInstanceOf[Seq[NamedLambdaVariable]]) &&
            isSum(merge, aggVars.asInstanceOf[Seq[NamedLambdaVariable]]) &&
            isIdentity(finish, finVars.asInstanceOf[Seq[NamedLambdaVariable]]) =>
        DotProduct(a, b)
    }

  /** Convenience installer for an existing session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDot))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDot
}
