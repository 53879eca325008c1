package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, MapType, StructType}
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

/** Catalyst optimizer rule: recognize the declarative top-k-per-key idiom
  *
  *   df.withColumn("rn", row_number().over(Window.partitionBy(K).orderBy(O)))
  *     .where($"rn" <= k)
  *
  * and replan it as the [[TopKPerKey]] whole-operator extension — bounded
  * k-row heaps, partial/final passes, no per-partition sort — so users (and
  * existing query code) keep writing the window form and get the sort-free
  * physics automatically. Matched forms: `rn <= k`, `rn < k`, `rn = 1`
  * (dedup-keep-first), in either operand order, possibly conjoined with
  * other predicates (which remain as a residual Filter above the TopKPerKey).
  *
  * Semantics note: identical to the window form when the ordering is total
  * (the repo-wide tiebreak discipline, SURVEY §7.5.5); under order ties both
  * forms pick an arbitrary tied row.
  *
  * Spark's own InferWindowGroupLimit (which only prunes below the window,
  * still paying the sort) may have inserted a [[WindowGroupLimit]] below the
  * matched Window — it is stripped, TopKPerKey subsumes it.
  */
object RewriteRankLimitToTopK extends Rule[LogicalPlan] with PredicateHelper {

  private def containsFloat(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case s: StructType => s.fields.exists(f => containsFloat(f.dataType))
    case ArrayType(et, _) => containsFloat(et)
    case MapType(kt, vt, _) => containsFloat(kt) || containsFloat(vt)
    case _ => false
  }

  /** TopKPerKeyExec groups by raw UnsafeRow key bytes, so -0.0 vs 0.0 and
    * non-canonical NaN bit patterns would land in DIFFERENT groups, where
    * WindowExec (whose partition keys pass through NormalizeFloatingNumbers)
    * groups them together. Keys Spark already canonicalized (wrapped in
    * [[KnownFloatingPointNormalized]] — the User-Provided-Optimizers path,
    * which runs after the NormalizeFloatingNumbers batch) pass through;
    * bare top-level float/double keys (the injectOptimizerRule path, which
    * runs before it) are wrapped in the same [[NormalizeNaNAndZero]] the
    * optimizer uses; a bare float nested inside a struct/array/map key has
    * no cheap expression-level normalizer here, so [[normalizeKeys]] returns
    * None and the rewrite declines — WindowExec keeps those (rare) plans.
    */
  private[plans] def normalizeKeys(keys: Seq[Expression]): Option[Seq[Expression]] = {
    val normed = keys.map {
      case k @ KnownFloatingPointNormalized(_) => Some(k)
      case k => k.dataType match {
        case FloatType | DoubleType => Some(NormalizeNaNAndZero(k))
        case dt if containsFloat(dt) => None
        case _ => Some(k)
      }
    }
    if (normed.forall(_.isDefined)) Some(normed.flatten) else None
  }

  /** k such that `cond` ≡ rank <= k, if it is a rank bound. */
  private def rankLimit(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rank) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rank) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rank) => Some(1)
    case EqualTo(Literal(1, IntegerType), a: Attribute) if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // parts/order are taken from the Window NODE's spec (not the copy inside
    // WindowSpecDefinition): NormalizeFloatingNumbers rewrites only the node
    // spec, and WindowGroupLimit carries the node spec — reading the same
    // copy keeps float keys canonical and the strip comparison exact
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          parts, order, wchild, _))
        if parts.nonEmpty && order.nonEmpty =>
      val rank = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val (rankPreds, rest) = conjuncts.partition(c => rankLimit(c, rank).isDefined)
      val maxK = conf.getConfString("spark.graft.topk.rewriteMaxK", "1000").toInt
      val kOpt = rankPreds.flatMap(c => rankLimit(c, rank)).minOption
      (kOpt, normalizeKeys(parts)) match {
        // k < 1 is a statically-empty filter (row_number >= 1 always) and
        // huge k defeats the bounded-heap point — leave both to Spark
        case (Some(k), Some(normKeys)) if k >= 1 && k <= maxK =>
          val child = wchild match {
            case WindowGroupLimit(p2, o2, _, _, c) if p2 == parts && o2 == order => c
            case c => c
          }
          val topk = TopKPerKey(normKeys, order, k, rank, child)
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
        case _ => f
      }
  }
}

/** Session extension installing graft's optimizer rules and planner
  * strategies (the [[TopKPerKey]] whole-operator extension).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
    e.injectOptimizerRule(_ => RewriteRankLimitToTopK)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
