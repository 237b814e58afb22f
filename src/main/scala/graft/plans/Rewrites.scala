package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DotProductExpr

/** Optimizer strength-reduction: rewrite the compositional dot-product
  * pattern `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) ->
  * acc + v)` into the codegen'd [[graft.functions.DotProductExpr]].
  *
  * Why a Rule (and not just the graft_dot function): SQL/HOF users who
  * write the textbook formulation silently get the native kernel — the HOF
  * form evaluates one interpreted lambda dispatch per element, which is
  * the difference between a vector scan being compute-bound or not at
  * corpus scale (see DotProductExpr's scaladoc).
  *
  * Safety — the rewrite fires ONLY when it is observably equivalent:
  *  - both inputs are array<double> (any element nullability: parquet
  *    always reads elements back as nullable, so requiring dense arrays
  *    would make the rule a no-op in practice);
  *  - the rewritten expression runs in `strict` mode, which reproduces
  *    the HOF's null semantics exactly — null on length mismatch (the
  *    zip's null-padding nulls the fold) and null on any null element;
  *  - zero literal is exactly 0.0 (double), the merge is a plain `+`, the
  *    finish lambda is identity — anything else is left alone.
  * Accumulation order (left-to-right) is identical, so results are
  * bit-for-bit equal. Registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions`
  * (injectOptimizerRule).
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def doubleArray(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }

  private def sameVars(used: (NamedLambdaVariable, NamedLambdaVariable),
                       declared: Seq[NamedExpression]): Boolean = {
    val ids = declared.collect { case v: NamedLambdaVariable => v.exprId }.toSet
    ids.size == 2 && Set(used._1.exprId, used._2.exprId) == ids
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(Multiply(mx: NamedLambdaVariable,
                my: NamedLambdaVariable, _), zargs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(ax: NamedLambdaVariable,
              ay: NamedLambdaVariable, _), margs, _),
            LambdaFunction(f: NamedLambdaVariable, Seq(fd: NamedLambdaVariable), _))
          if sameVars((mx, my), zargs) && sameVars((ax, ay), margs) &&
            f.exprId == fd.exprId &&
            doubleArray(l.dataType) && doubleArray(r.dataType) =>
        DotProductExpr(l, r, strict = true)
    }
}
