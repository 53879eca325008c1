package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.functions.LongDot

/** Catalyst optimizer rule (SURVEY §7.4(c) surface): rewrite the
  * higher-order-function dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * over ARRAY<BIGINT> columns into the native [[graft.functions.LongDot]]
  * expression. The HOF form allocates an intermediate zipped array and
  * evaluates two boxed lambdas per element; LongDot is a primitive loop
  * inside whole-stage codegen. Users (and SQL text) can keep writing the
  * declarative HOF form — the optimizer swaps in the fast path, the same
  * shape as Spark's own expression-rewrite rules.
  *
  * Registered via [[GraftExtensions]]:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private object MulLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object IdentityLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        x.exprId == a.exprId
      case _ => false
    }
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, MulLambda()),
        Literal(0L, LongType),
        AddLambda(),
        IdentityLambda()) if isLongArray(a) && isLongArray(b) =>
      LongDot(a, b)
  }
}

/** Session extension installing graft's optimizer rules and planner
  * strategies (the [[TopKPerKey]] whole-operator extension).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
