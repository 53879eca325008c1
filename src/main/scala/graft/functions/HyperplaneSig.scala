package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the full hyperplane sign signature of a
  * quantized embedding — bit j of the result is `1` iff `q · planes(j) ≥ 0`
  * — in ONE expression evaluating a single nested primitive loop.
  *
  * Why custom (SURVEY §7.4, preference (b)): composing this from 64
  * `when(long_dot(q, plane_j) >= 0, …)` columns is semantically identical
  * but generates a projection method whose bytecode grows linearly with the
  * plane count, and past ~32 planes it crosses HotSpot's JIT compile
  * threshold — the whole projection drops to interpreted bytecode and the
  * scan stage slows ~10× (measured in `graft.Probe`: 16 planes 0.34 s,
  * 32 planes 0.65 s, 64 planes 5.7 s on identical data; docs/SCALE.md).
  * Here the weights live in one referenced `long[][]` and the generated
  * code is a fixed-size nested loop — constant bytecode regardless of plane
  * count.
  *
  * NULL semantics mirror [[LongDot]]: a NULL input array, a NULL element,
  * or a dimension mismatch against any plane → NULL (the poisoned-dot
  * discipline, so the banded join silently drops malformed vectors instead
  * of bucketing them arbitrarily).
  *
  * `planes` is a Seq (not Array) so case-class equality compares CONTENTS:
  * two sig expressions over the same planes canonicalize equal, which is
  * what common-subexpression elimination and plan-keyed cache matching
  * (CacheScope) key on. The hot paths index a transient primitive copy.
  */
case class HyperplaneSig(child: Expression, planes: Seq[Seq[Long]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64,
    s"1..64 planes (one sign bit each), got ${planes.length}")

  @transient private lazy val planeArr: Array[Array[Long]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dims = x.numElements()
    var sig = 0L
    var j = 0
    while (j < planeArr.length) {
      val p = planeArr(j)
      if (p.length != dims) return null
      var acc = 0L
      var i = 0
      while (i < dims) {
        if (x.isNullAt(i)) return null
        acc += x.getLong(i) * p(i)
        i += 1
      }
      if (acc >= 0L) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ps = ctx.addReferenceObj("planes", planeArr, "long[][]")
      val dims = ctx.freshName("dims")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $dims = $a.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < $ps.length && !${ev.isNull}; $j++) {
         |  long[] $p = $ps[$j];
         |  if ($p.length != $dims) { ${ev.isNull} = true; break; }
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $p[$i];
         |  }
         |  if (!${ev.isNull} && $acc >= 0L) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Column API: 64-bit (or fewer) hyperplane sign signature. */
  def hyperplane_sig(q: Column, planes: Seq[Seq[Long]]): Column =
    SqlBridge.column(HyperplaneSig(SqlBridge.expression(q), planes))
}
