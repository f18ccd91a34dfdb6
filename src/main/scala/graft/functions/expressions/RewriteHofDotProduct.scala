package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rewrite: the composable dot-product pattern
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, v) => acc + v)`
  * — which Spark evaluates INTERPRETED (higher-order functions never
  * enter codegen) — becomes the fused native [[DotProduct]]
  * expression. Same IEEE accumulation order and null semantics, so
  * the rewrite is result-invariant; it exists so code written against
  * `functions._` composition gets the codegen'd loop without knowing
  * about graft's expressions.
  *
  * Also matches the self-product form
  * `aggregate(transform(a, x => x * x), 0d, _ + _)` (the squared-norm
  * pattern) as `DotProduct(a, a)`.
  *
  * Installed by [[graft.functions.GraftExtensions]]
  * (injectOptimizerRule) or `GraftFunctions.register` (via
  * `spark.experimental.extraOptimizations`).
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object IdentityLambda {
    def unapply(l: LambdaFunction): Boolean = l match {
      case LambdaFunction(v: NamedLambdaVariable,
          Seq(p: NamedLambdaVariable), _) => v.exprId == p.exprId
      case _ => false
    }
  }

  private object SumLambda {
    def unapply(l: LambdaFunction): Boolean = l match {
      case LambdaFunction(Add(a: NamedLambdaVariable,
          b: NamedLambdaVariable, _),
          Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _) =>
        (a.exprId == p1.exprId && b.exprId == p2.exprId) ||
          (a.exprId == p2.exprId && b.exprId == p1.exprId)
      case _ => false
    }
  }

  private object ZeroLiteral {
    def unapply(e: Expression): Boolean = e match {
      case Literal(0.0, DoubleType) => true
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // aggregate(zip_with(a, b, _*_), 0.0, _+_ [, identity])
      case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(
            Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _)),
          ZeroLiteral(), SumLambda(), IdentityLambda())
          if isDoubleArray(l) && isDoubleArray(r) &&
            ((x.exprId == p1.exprId && y.exprId == p2.exprId) ||
              (x.exprId == p2.exprId && y.exprId == p1.exprId)) =>
        DotProduct(l, r)

      // aggregate(transform(a, x => x*x), 0.0, _+_ [, identity])
      case ArrayAggregate(
          ArrayTransform(a, LambdaFunction(
            Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(p: NamedLambdaVariable), _)),
          ZeroLiteral(), SumLambda(), IdentityLambda())
          if isDoubleArray(a) &&
            x.exprId == p.exprId && y.exprId == p.exprId =>
        DotProduct(a, a)

      // aggregate(zip_with(a, b, (x, y) => (x−y)*(x−y)), 0.0, _+_)
      // → the fused L2 kernel; both factors must be the SAME
      // orientation ((y−x)² matches too — equal value — but the
      // mixed (x−y)(y−x) form is the NEGATED square and must not)
      case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(
            Multiply(
              Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
              Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _),
              _),
            Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _)),
          ZeroLiteral(), SumLambda(), IdentityLambda())
          if isDoubleArray(l) && isDoubleArray(r) &&
            x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
            ((x1.exprId == p1.exprId && y1.exprId == p2.exprId) ||
              (x1.exprId == p2.exprId && y1.exprId == p1.exprId)) =>
        L2DistanceSq(l, r)
    }
}
