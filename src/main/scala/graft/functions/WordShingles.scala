package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct word k-gram shingles of a token
  * array — `array_distinct` of `tok[i] ⊔ " " ⊔ … ⊔ tok[i+k-1]`, empty when
  * fewer than k tokens.
  *
  * Why custom (SURVEY §7.4, preference (b), same reasoning as [[LongDot]]):
  * the HOF form — nested `zip_with(slice, slice, concat)` — is
  * CodegenFallback with two boxed lambdas per element and three array
  * allocations per row, and it sits at the bottom of every shingle-based
  * dedup operator (minhash, simhash, ngram-jaccard), i.e. it runs once per
  * document per pipeline stage. One primitive loop in whole-stage codegen.
  *
  * Exact-parity semantics with the HOF form it replaces
  * (graft.operators.Dedup history): NULL token array → NULL; fewer than k
  * tokens → empty array; a NULL token poisons its k-gram (SQL `concat`
  * null-propagation) and `array_distinct` keeps a single NULL in
  * first-occurrence order.
  */
case class WordShingles(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(k >= 1, s"WordShingles: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements() - k + 1
    if (toks.numElements() < k) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet in distinct mode, ArrayList otherwise — both keep
    // first-occurrence order, matching array_distinct / plain zip_with
    val seen: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      var j = 0
      var hasNull = false
      val parts = new Array[UTF8String](k)
      while (j < k) {
        if (toks.isNullAt(i + j)) hasNull = true
        else parts(j) = toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(if (hasNull) null else UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](0)).asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val seen = ctx.freshName("seen")
      val parts = ctx.freshName("parts")
      val hasNull = ctx.freshName("hasNull")
      val utf8 = classOf[UTF8String].getName
      val coll =
        if (distinct) s"java.util.LinkedHashSet<$utf8>"
        else s"java.util.ArrayList<$utf8>"
      s"""
         |int $n = $a.numElements() - ${k - 1};
         |java.util.Collection<$utf8> $seen = new $coll();
         |for (int $i = 0; $i < $n; $i++) {
         |  $utf8[] $parts = new $utf8[$k];
         |  boolean $hasNull = false;
         |  for (int $j = 0; $j < $k; $j++) {
         |    if ($a.isNullAt($i + $j)) $hasNull = true;
         |    else $parts[$j] = $a.getUTF8String($i + $j);
         |  }
         |  $seen.add($hasNull ? null : $utf8.concatWs($sepRef, $parts));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $seen.toArray(new Object[0]));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Column API: distinct word k-gram shingles of a token array column. */
  def word_shingles(tokens: Column, k: Int): Column =
    SqlBridge.column(WordShingles(SqlBridge.expression(tokens), k))

  /** All k-grams in order with multiplicities (repetition analysis). */
  def word_grams(tokens: Column, k: Int): Column =
    SqlBridge.column(WordShingles(SqlBridge.expression(tokens), k, distinct = false))
}
