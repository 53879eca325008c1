package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: sum of squares of an ARRAY<FLOAT> column in
  * DOUBLE, accumulated strictly left-to-right.
  *
  * Why custom (SURVEY §7.4, preference (b)): the HOF equivalent
  * `aggregate(transform(v, x -> double(x)*double(x)), 0d, (a,x) -> a+x)`
  * allocates an intermediate array and runs two interpreted lambdas per
  * element (HOFs are CodegenFallback); this is one primitive loop inside
  * whole-stage codegen — it runs once per corpus vector in embedding-QA
  * passes, i.e. O(corpus) times at 100 TB.
  *
  * The left-to-right order is a semantic contract, not an implementation
  * detail: float→double widening is exact and double addition in a fixed
  * order is deterministic, so the result is bit-identical to DuckDB's
  * `list_reduce(list_prepend(0.0, list_transform(v, x -> x*x)), (a,b)->a+b)`
  * — which is what makes norm-derived metrics oracle-checkable. A NULL
  * element poisons the row to NULL (matches the HOF's zip semantics).
  */
case class FloatNormSq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0d;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = (double) $a.getFloat($i);
         |  $acc += $x * $x;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatNormSq =
    copy(newChild)
}

object VecNorm {
  /** Column API: exact left-fold sum of squares of an ARRAY<FLOAT> column. */
  def float_norm_sq(v: Column): Column =
    SqlBridge.column(FloatNormSq(SqlBridge.expression(v)))
}
