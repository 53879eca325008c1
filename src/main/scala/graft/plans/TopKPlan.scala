package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension (SURVEY §7.4 preference (c)): top-k
  * rows per key WITHOUT sorting — a custom LogicalPlan + SparkStrategy +
  * SparkPlan, the escalation step past custom expressions for semantics the
  * built-in operators can only express wastefully.
  *
  * The declarative form — `row_number().over(Window.partitionBy(key)
  * .orderBy(...)) <= k` — shuffles EVERY row of every key and then fully
  * sorts each partition (WindowExec requires local sort), O(n log n) per
  * partition, just to throw away all but k rows per key. This operator keeps
  * a bounded k-row heap per key and never sorts the data:
  *
  *  - partial pass (before the shuffle, like partial aggregation): each
  *    input partition reduces to ≤ k rows per key it has seen, so the
  *    exchange moves at most k·parts rows per key no matter how hot the key
  *    — the same skew-robustness argument as map-side combine;
  *  - final pass after a hash exchange on the key merges the partials and
  *    emits each key's k rows with a rank column, O(n log k) total, O(k)
  *    memory per key.
  *
  * At 100 TB this is the difference between "shuffle the fact table and
  * sort it" and "shuffle k rows per key per input split".
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans the logical node as a partial/final pair; EnsureRequirements adds
  * the hash exchange between them (final declares ClusteredDistribution).
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, Some(rankAttr), partial = false,
        TopKPerKeyExec(keys, order, k, None, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val emitRank = rankAttr.isDefined
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // max-heap of the kept set: the root is the WORST kept row, evicted
      // when a better row arrives
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](limit + 1, worstFirst)
          heaps.put(key.copy(), q)
        }
        if (q.size() < limit) q.add(row.copy())
        else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
      }
      val outProj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { q =>
        if (!emitRank) {
          // partial pass: emit the kept set unranked, any order
          q.iterator().asScala
        } else {
          val arr = q.toArray(new Array[InternalRow](q.size()))
          java.util.Arrays.sort(arr, ord)
          arr.iterator.zipWithIndex.map { case (r, i) =>
            outProj(joined(r, InternalRow(i + 1L))): InternalRow
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** DataFrame-facing API. */
object TopK {

  /** Install the planner strategy once per session (idempotent) — the same
    * public `experimental.extraStrategies` hook Spark documents for custom
    * strategies; also available via SparkSessionExtensions in
    * [[GraftExtensions]].
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top `k` rows per `keyCols` group under `orderBy` (column name →
    * descending?) with a LongType rank column appended. The ordering must be
    * total (include a tiebreak column) for deterministic output — same
    * contract as the row_number() form it replaces.
    */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int,
      rankName: String): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"topKPerKey: no column '$name' in ${analyzed.output.map(_.name)}"))
    val order = orderBy.map { case (name, desc) =>
      val dir = if (desc) Descending else Ascending
      SortOrder(attr(name), dir, dir.defaultNullOrdering, Seq.empty)
    }
    val rank = AttributeReference(rankName, LongType, nullable = false)()
    SqlBridge.dataFrame(spark,
      TopKPerKey(keyCols.map(attr), order, k, rank, analyzed))
  }
}
