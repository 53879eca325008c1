package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: positions where two ARRAY<BIGINT> columns
  * agree — the minhash signature-agreement count.
  *
  * Why custom (SURVEY §7.4, preference (b), same reasoning as [[LongDot]]):
  * the HOF form `size(filter(zip_with(a, b, (x,y) -> x = y), p -> p))`
  * allocates a zipped boolean array, runs two boxed lambdas per element, and
  * is CodegenFallback — it drops the whole candidate-verify projection out of
  * whole-stage codegen inside the LSH bucket self-join, the hottest loop of
  * near-dup detection. This is one primitive loop in codegen.
  *
  * Semantics exactly match that HOF form: NULL input array → NULL; a padded
  * position (unequal lengths) or a NULL element compares NULL → not counted;
  * result = #{i < min(|a|,|b|) : a(i) and b(i) non-null and equal},
  * IntegerType like `size`.
  */
case class LongEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) acc += 1
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)
         |      && $a.getLong($i) == $b.getLong($i)) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongEqCount = copy(newLeft, newRight)
}

object LongEqCount {
  /** Column API: agreement count of two ARRAY<BIGINT> columns. */
  def long_eq_count(a: Column, b: Column): Column =
    SqlBridge.column(LongEqCount(SqlBridge.expression(a), SqlBridge.expression(b)))
}
