package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: exact dot product of two ARRAY<BIGINT> columns.
  *
  * Why custom (SURVEY §7.4, preference (b)): the higher-order-function
  * equivalent `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)`
  * allocates a zipped array and evaluates two boxed lambdas per element; this
  * expression is a single primitive loop and participates in whole-stage
  * codegen, which matters when it runs N×Q times inside a similarity
  * self-join. Integer inputs (quantized embeddings) keep the result exact and
  * order-independent — required for cross-engine oracle parity.
  *
  * NULL semantics exactly match the HOF form (so the optimizer rewrite in
  * graft.plans.RewriteHofDotProduct preserves results): unequal lengths or a
  * NULL element anywhere in the overlapping zip → NULL (zip_with pads with
  * NULL, the NULL product poisons the sum).
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot = copy(newLeft, newRight)
}

object LongDot {
  /** Column API: exact ARRAY<BIGINT> dot product. */
  def long_dot(a: Column, b: Column): Column =
    SqlBridge.column(LongDot(SqlBridge.expression(a), SqlBridge.expression(b)))
}
