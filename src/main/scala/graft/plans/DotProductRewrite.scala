package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.DotProduct

/** Optimizer rule: recognize the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
  *
  * and rewrite it to the codegen'd [[DotProduct]] expression. Users
  * (and the SQL surface) can keep writing the portable HOF form; the
  * engine silently substitutes the fused-loop implementation, which
  * is bit-identical (same left-to-right summation) and ~10× faster.
  *
  * This is the one optimizer extension the engine ships: everything
  * else Catalyst already rewrites well (SURVEY §4.1/§4.2).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private object MulOfVars {
    /** x * y where both sides are the lambda's own variables. */
    def unapply(f: LambdaFunction): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable,
          y: NamedLambdaVariable, _), args, _) =>
        val ids = args.collect { case v: NamedLambdaVariable => v.exprId }.toSet
        ids.contains(x.exprId) && ids.contains(y.exprId) && x.exprId != y.exprId
      case _ => false
    }
  }

  private object AddOfVars {
    /** acc + v over the merge lambda's own variables. */
    def unapply(f: LambdaFunction): Boolean = f match {
      case LambdaFunction(Add(a: NamedLambdaVariable,
          b: NamedLambdaVariable, _), args, _) =>
        val ids = args.collect { case v: NamedLambdaVariable => v.exprId }.toSet
        ids.contains(a.exprId) && ids.contains(b.exprId) && a.exprId != b.exprId
      case _ => false
    }
  }

  private object IdentityFinish {
    /** finish lambda that returns its single argument unchanged. */
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        v.exprId == arg.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, mul @ MulOfVars()),
            Literal(0.0, DoubleType),
            merge @ AddOfVars(),
            finish @ IdentityFinish()) =>
        DotProduct(a, b)
    }
}

/** Session extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => DotProductRewrite)
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.DotProduct].getName, "graft_dot"),
        (exprs: Seq[Expression]) =>
          graft.functions.DotProduct(exprs(0), exprs(1))))
  }
}
