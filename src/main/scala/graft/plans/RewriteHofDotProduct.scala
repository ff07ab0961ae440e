package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognize the higher-order-function dot product —
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * over float arrays and replace it with the codegen'd [[FloatVecDot]].
  * HOF lambdas are CodegenFallback (interpreted, boxing every element);
  * the native expression stays inside whole-stage codegen — measured
  * ~50x on embedding-sized arrays. The rewrite is result-identical:
  * same left-to-right fold order and double math; same null semantics
  * (zip_with pads a length mismatch with null, null poisons the fold —
  * exactly FloatVecDot's null result; empty arrays give 0.0 in both).
  *
  * Runs in the user-rule batch (after constant folding, so the SQL
  * literal `CAST(0.0 AS DOUBLE)` has already collapsed to 0.0).
  * Installed by [[GraftExtensions]] via injectOptimizerRule, or on a
  * live session through `spark.experimental.extraOptimizations`.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  /** Strip the widening casts the analyzer inserts around lambda vars
    * (float element -> double product).
    */
  private def unwrap(e: Expression): Expression = e match {
    case Cast(child, DoubleType, _, _) => unwrap(child)
    case _ => e
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    unwrap(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) => v == 0.0
    case _ => false
  }

  /** x*y in either order (IEEE multiplication commutes bitwise). */
  private def isProduct(e: Expression, x: NamedLambdaVariable,
                        y: NamedLambdaVariable): Boolean = e match {
    case Multiply(l, r, _) =>
      (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
    case _ => false
  }

  private def isSum(e: Expression, acc: NamedLambdaVariable,
                    v: NamedLambdaVariable): Boolean = e match {
    case Add(l, r, _) =>
      (isVar(l, acc) && isVar(r, v)) || (isVar(l, v) && isVar(r, acc))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(prod, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(mergeBody, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(finishBody, Seq(fin: NamedLambdaVariable), _))
        if isFloatArray(a) && isFloatArray(b) && isZero(zero) &&
          isProduct(prod, x, y) && isSum(mergeBody, acc, v) &&
          isVar(finishBody, fin) =>
        FloatVecDot(a, b)
    }
}
