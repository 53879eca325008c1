package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: argmin-centroid assignment for a quantized
  * vector against a fixed integer codebook — `argmin_c (||c||² − 2·x·c)`,
  * ties to the lowest centroid id (exactly the `least`-of-structs encoding
  * the k-means/IVF/PQ operators previously spelled out column-wise).
  *
  * Why custom (SURVEY §7.4, preference (b)): the struct encoding expands to
  * k parallel LongDot subtrees plus a k-way `least` — for PQ's m=4
  * subspaces × k=8 centroids that is a janino unit whose COMPILATION cost
  * exceeded the whole scan at bench scale (measured ~2 s per plan on
  * sim_search_pq, re-paid whenever the codegen cache rotates), and the
  * generated code re-reads the input array k times. This expression is two
  * nested primitive loops over a `long[][]` codebook reference — O(k·dim)
  * with one array traversal per centroid, constant-size generated code no
  * matter how large the codebook.
  *
  * The codebook ships as a literal model in the plan (same footprint class
  * as the struct encoding's k inline arrays). NULL semantics: a NULL input
  * array, a NULL element, or a dimension mismatch with any codebook row →
  * NULL (the struct form's null-poisoned scores never win `least`, so on
  * real — non-null, fixed-dim — corpora the two forms agree everywhere;
  * this form fails CLOSED instead of electing an arbitrary centroid).
  */
case class CentroidArgmin(child: Expression, centroids: Seq[Seq[Long]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "centroid_argmin needs a non-empty codebook")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // primitive model + precomputed ||c||², shared by interpreted and codegen
  @transient private lazy val model: Array[Array[Long]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Long] =
    model.map(c => c.map(v => v * v).sum)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var best = Long.MaxValue
    var bestCid = -1L
    var cid = 0
    while (cid < model.length) {
      val c = model(cid)
      if (c.length != n) return null
      var dot = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        dot += x.getLong(i) * c(i)
        i += 1
      }
      val score = norms(cid) - 2 * dot
      if (score < best) { best = score; bestCid = cid }
      cid += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", model, "long[][]")
      val nsq = ctx.addReferenceObj("norms", norms, "long[]")
      val n = ctx.freshName("n")
      val cid = ctx.freshName("cid")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val score = ctx.freshName("score")
      val cent = ctx.freshName("cent")
      s"""
         |int $n = $a.numElements();
         |long $best = Long.MAX_VALUE;
         |long $bestCid = -1L;
         |for (int $cid = 0; $cid < $cents.length && !${ev.isNull}; $cid++) {
         |  long[] $cent = $cents[$cid];
         |  if ($cent.length != $n) { ${ev.isNull} = true; break; }
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getLong($i) * $cent[$i];
         |  }
         |  long $score = $nsq[$cid] - 2L * $dot;
         |  if (!${ev.isNull} && $score < $best) { $best = $score; $bestCid = $cid; }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidArgmin =
    copy(child = newChild)
  override def prettyName: String = "centroid_argmin"
}

object CentroidArgmin {
  /** Column API: id (BIGINT) of the codebook centroid minimizing
    * `||c||² − 2·x·c` over the ARRAY<BIGINT> column, ties to the lowest id.
    */
  def centroid_argmin(x: Column, centroids: Seq[Array[Long]]): Column =
    SqlBridge.column(
      CentroidArgmin(SqlBridge.expression(x), centroids.map(_.toSeq)))
}
