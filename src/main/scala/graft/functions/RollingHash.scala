package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: base-31 rolling hash of a STRING column,
  * folded over its UTF-8 bytes mod 2^31-1.
  *
  * Why custom (SURVEY §7.4, preference (b)): the higher-order-function form
  * — `aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s, i,
  * 1))), 0L, (acc, c) -> (acc*31 + c) % P)` — materializes a boxed
  * per-character array, calls substr/ascii per element, and drops the whole
  * projection out of whole-stage codegen (CodegenFallback). This expression
  * is one primitive loop over the string's bytes inside codegen.
  *
  * Byte-vs-codepoint note: for ASCII input (the canonicalized corpus and
  * the DuckDB oracle's ascii() twin) bytes and codepoints coincide, and
  * OperatorSpec asserts equality against the HOF form; for non-ASCII input
  * this hashes UTF-8 bytes, which is the saner contract at scale (no
  * codepoint decoding) but diverges from ascii()-per-char.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  private val P = 2147483647L

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % P
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31L + ($bytes[$i] & 0xFF)) % ${P}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(newChild)
}

object RollingHash {
  /** Column API: base-31/mod-2^31-1 rolling hash of a string's UTF-8 bytes. */
  def rolling_hash(s: Column): Column =
    SqlBridge.column(RollingHash(SqlBridge.expression(s)))
}
