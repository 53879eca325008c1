package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a native Catalyst
  * `TypedImperativeAggregate` — the bounded-memory, MERGEABLE scale path
  * for per-group top-terms. The exact `text_top_terms` shuffles one row per
  * distinct (group, term); at 100-TB vocabularies that IS the job. This
  * aggregate holds at most `capacity` counters per group, partials merge
  * map-side like any aggregate buffer, and the classic guarantees hold
  * regardless of partitioning or arrival order:
  *
  *  - any term with true frequency > n/capacity is RETAINED (n = group
  *    size), so the real heavy hitters cannot be evicted;
  *  - every reported count is an underestimate by at most n/capacity.
  *
  * Merge is the Agarwal et al. mergeable-summaries rule: add counters,
  * then if more than `capacity` survive, subtract the (capacity+1)-th
  * largest count from all and drop the non-positives — which preserves
  * both guarantees compositionally. When `capacity` exceeds the group's
  * distinct-term count the summary never evicts and the counts are EXACT
  * (the property the oracle-checked registered query runs in; the eviction
  * path is spec-covered with a small capacity).
  *
  * The buffer is a plain hash map serialized with (length, utf8-bytes,
  * count) framing; input UTF8Strings are copied on first insert because
  * they alias Tungsten row buffers that the scan reuses.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long], input: InternalRow)
      : mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) {
      buf.get(v) match {
        case Some(c) => buf.update(v, c + 1)
        case None if buf.size < capacity =>
          buf.update(v.clone(), 1L) // detach from the reused scan buffer
        case None =>
          // classic MG step: a miss at capacity decrements every counter
          // (iterate a key snapshot — mutating during iteration is UB)
          buf.keys.toArray.foreach { t =>
            val c = buf(t) - 1
            if (c == 0) buf.remove(t) else buf.update(t, c)
          }
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from all, drop <= 0
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1)
      buf.keys.toArray.foreach { t =>
        val c = buf(t) - d
        if (c <= 0) buf.remove(t) else buf.update(t, c)
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val top = buf.toArray
      .sortBy { case (t, c) => (-c, t) } // count desc, term asc: total order
      .take(k)
      .map { case (t, c) => InternalRow(t, c) }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
  override def prettyName: String = "misra_gries_topk"
}

object MisraGries {
  /** Column wrapper: top-`k` heavy hitters of `c` with `capacity` counters. */
  def freq_topk(c: Column, k: Int, capacity: Int): Column =
    SqlBridge.column(
      MisraGries(SqlBridge.expression(c), k, capacity).toAggregateExpression())
}
