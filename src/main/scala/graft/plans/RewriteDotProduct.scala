package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the composable dot-product shape
  *
  *   `aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v)`
  *
  * into the codegen'd [[graft.functions.DotProduct]] expression. The
  * declarative form is what users naturally write (and what several
  * operators here write); it evaluates as interpreted lambda
  * expressions and allocates an intermediate array per row. The
  * rewrite keeps the plan declarative at the API surface and swaps in
  * the tight whole-stage-codegen loop — the Catalyst-native version of
  * "functions, not UDFs" applied to our own extension point.
  *
  * Semantics preserved under the engine's VECTOR-COLUMN contract
  * (equal-length arrays, no null elements — every embedding column
  * here): summation is sequential ascending-index in both forms, so
  * results are bit-identical (re-proven by the oracle gate replica for
  * every affected query when this rule shipped). Outside that
  * contract the two forms differ only on ragged pairs (`zip_with`
  * null-pads and poisons the sum to NULL; `dot_product` stops at the
  * shorter length), which is why the rewrite matches the exact
  * multiply/sum lambda shape and nothing looser.
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule) and
  * added to `spark.experimental.extraOptimizations` by the Verify /
  * Bench / plan-dump mains and the shared test session.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {
  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** (x, y) => x * y, either operand order (IEEE multiply commutes). */
  private def isElementwiseMul(lf: Expression): Boolean = lf match {
    case LambdaFunction(m: Multiply,
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (sameVar(m.left, x) && sameVar(m.right, y)) ||
        (sameVar(m.left, y) && sameVar(m.right, x))
    case _ => false
  }

  /** (acc, v) => acc + v, either operand order (IEEE add commutes). */
  private def isSumMerge(lf: Expression): Boolean = lf match {
    case LambdaFunction(a: Add,
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (sameVar(a.left, acc) && sameVar(a.right, v)) ||
        (sameVar(a.left, v) && sameVar(a.right, acc))
    case _ => false
  }

  /** acc => acc (the implicit finish of `functions.aggregate`). */
  private def isIdentity(lf: Expression): Boolean = lf match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(l, r, mul), Literal(z: Double, DoubleType),
          merge, finish)
          if z == 0.0 && isElementwiseMul(mul) && isSumMerge(merge) &&
            isIdentity(finish) =>
        DotProduct(l, r)
    }
}
