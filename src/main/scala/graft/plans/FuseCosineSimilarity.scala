package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.CosineSimilarity

/** Optimizer rule: rewrite the readable higher-order-function cosine
  * pattern built by [[graft.functions.VectorFunctions.cosineSimilarity]]
  *
  * {{{ when(mag(a)*mag(b) === 0, 0).otherwise(greatest(dot(a,b)/(mag(a)*mag(b)), 0)) }}}
  *
  * into the fused codegen expression [[CosineSimilarity]]. The two forms
  * are bit-identical by construction (same fold order, clamp, zero
  * guard); the fused form runs as one generated loop instead of five
  * interpreted array traversals. Users who write the declarative HOF form
  * get the fast plan automatically once this rule is installed (via
  * [[GraftExtensions]] or `spark.experimental.extraOptimizations`).
  */
object FuseCosineSimilarity extends Rule[LogicalPlan] {

  private object Zero {
    def unapply(e: Expression): Boolean = e match {
      case Literal(v: Double, DoubleType) => v == 0.0
      case _ => false
    }
  }

  /** aggregate(v, 0.0, (acc, x) => acc + x*x) — the squared-magnitude fold. */
  private object SquareSum {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(v, Literal(z: Double, DoubleType),
          LambdaFunction(Add(acc: NamedLambdaVariable,
            Multiply(x1: NamedLambdaVariable, x2: NamedLambdaVariable, _), _), _, _),
          LambdaFunction(_: NamedLambdaVariable, _, _))
          if z == 0.0 && x1.exprId == x2.exprId && acc.exprId != x1.exprId =>
        Some(v)
      case _ => None
    }
  }

  /** aggregate(zip_with(a, b, _*_), 0.0, _+_) — the dot-product fold. */
  private object Dot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _)),
          Literal(z: Double, DoubleType),
          LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
          LambdaFunction(_: NamedLambdaVariable, _, _)) if z == 0.0 =>
        Some((a, b))
      case _ => None
    }
  }

  private object MagProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Multiply(Sqrt(SquareSum(a)), Sqrt(SquareSum(b)), _) => Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CaseWhen(
          Seq((EqualTo(MagProduct(a1, b1), Zero()), Zero())),
          Some(Greatest(Seq(Divide(Dot(a2, b2), MagProduct(a3, b3), _), Zero()))))
          if a1.semanticEquals(a2) && a1.semanticEquals(a3) &&
            b1.semanticEquals(b2) && b1.semanticEquals(b3) =>
        CosineSimilarity(a1, b1)
    }
}
