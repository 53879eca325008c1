package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
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

/** Physical top-k-per-key with bounded memory at ANY key cardinality.
  *
  * The retained set (≤ k rows per tracked key) is capped at
  * `spark.graft.topk.maxRowsInMemory` rows per partition — an exact bound:
  * once reached, a row can only be absorbed if it REPLACES a row in an
  * already-full heap. Otherwise:
  *
  *  - partial pass: the row PASSES THROUGH unreduced (always correct — the
  *    final pass re-reduces; this is exactly Spark's hash-aggregate partial
  *    fallback) — memory never grows past the budget;
  *  - final pass: the retained set is SPILLED to a run file sorted by key
  *    bytes, and at end-of-input the runs plus the in-memory remainder are
  *    k-way merged by key — grouping is restored by the merge order, so only
  *    ONE key's ≤k-row heap is live during emission. Exact output, O(budget)
  *    memory, O(n log k) compares plus spill I/O. Spill files are allocated
  *    under `spark.local.dir` via the DiskBlockManager (the disks the
  *    cluster sized for shuffle I/O, not `java.io.tmpdir`) and deleted by a
  *    task-completion listener even when the task fails or its output
  *    iterator is never drained (a LIMIT above).
  *
  * Observable via SQLMetrics: output rows, distinct keys, spill count,
  * spill bytes, partial pass-through rows.
  */
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

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "numKeys" -> SQLMetrics.createMetric(sparkContext, "distinct keys"),
    "spillCount" -> SQLMetrics.createMetric(sparkContext, "spilled runs"),
    "spillBytes" -> SQLMetrics.createSizeMetric(sparkContext, "spill size"),
    "passThroughRows" -> SQLMetrics.createMetric(sparkContext,
      "rows passed through unreduced (partial budget fallback)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val outTypes = output.map(_.dataType).toArray
    val rankIsInt = rankAttr.exists(_.dataType == org.apache.spark.sql.types.IntegerType)
    val isPartial = partial
    val budget = conf.getConfString("spark.graft.topk.maxRowsInMemory", "4194304").toLong
    val numOutputRows = longMetric("numOutputRows")
    val numKeys = longMetric("numKeys")
    val spillCount = longMetric("spillCount")
    val spillBytes = longMetric("spillBytes")
    val passThroughRows = longMetric("passThroughRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // max-heap of the kept set: the root is the WORST kept row, evicted
      // when a better row arrives
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      var retained = 0L
      val spills = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
      // spill files must die with the TASK, not the JVM: a killed/failed
      // task, or an output iterator never drained to EOF (a LIMIT above),
      // would otherwise leak them for the life of a long-running executor
      val taskCtx = org.apache.spark.TaskContext.get()
      if (taskCtx != null) taskCtx.addTaskCompletionListener[Unit] { _ =>
        spills.foreach(f => if (f.exists()) f.delete())
      }

      def unsafeCopy(row: InternalRow): UnsafeRow = row match {
        case u: UnsafeRow => u.copy()
        case r => toUnsafe(r).copy()
      }
      // key-byte order: any total order that groups equal keys works, and
      // equal keys have identical UnsafeRow bytes
      def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) {
          val c = (a(i) & 0xff) - (b(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        a.length - b.length
      }
      def sortedEntries(): Array[(Array[Byte], java.util.PriorityQueue[UnsafeRow])] = {
        import scala.jdk.CollectionConverters._
        val arr = heaps.entrySet().asScala
          .map(e => (e.getKey.getBytes, e.getValue)).toArray
        java.util.Arrays.sort(arr, new java.util.Comparator[(Array[Byte], java.util.PriorityQueue[UnsafeRow])] {
          override def compare(
              a: (Array[Byte], java.util.PriorityQueue[UnsafeRow]),
              b: (Array[Byte], java.util.PriorityQueue[UnsafeRow])): Int = cmpBytes(a._1, b._1)
        })
        arr
      }
      def spill(): Unit = {
        // allocated under spark.local.dir via the DiskBlockManager — same
        // placement as Spark's own shuffle spills, never java.io.tmpdir
        val f = SqlBridge.createSpillFile("graft-topk-spill")
        val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(f), 1 << 16))
        sortedEntries().foreach { case (kb, q) =>
          val it = q.iterator()
          while (it.hasNext) {
            val rb = it.next().getBytes
            out.writeInt(kb.length); out.write(kb)
            out.writeInt(rb.length); out.write(rb)
          }
        }
        out.close()
        spills += f
        spillCount += 1
        spillBytes += f.length()
        heaps.clear()
        retained = 0
      }
      // a row into a FULL tracked heap replaces its worst row instead of
      // growing the retained set — absorbing it never violates the budget
      def fullHeap(key: UnsafeRow): Boolean = {
        val q = heaps.get(key)
        q != null && q.size() >= limit
      }
      def absorb(key: UnsafeRow, row: InternalRow): Unit = {
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[UnsafeRow](limit + 1, worstFirst)
          heaps.put(key.copy(), q)
        }
        if (q.size() < limit) { q.add(unsafeCopy(row)); retained += 1 }
        else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(unsafeCopy(row)) }
      }

      val outProj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      import scala.jdk.CollectionConverters._

      def rankedOut(rows: Iterator[java.util.PriorityQueue[UnsafeRow]]): Iterator[InternalRow] =
        rows.flatMap { q =>
          numKeys += 1
          val arr = q.toArray(new Array[UnsafeRow](q.size()))
          java.util.Arrays.sort(arr, new java.util.Comparator[UnsafeRow] {
            override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(a, b)
          })
          numOutputRows += arr.length
          arr.iterator.zipWithIndex.map { case (r, i) =>
            // rank typed to the declared attribute: IntegerType when the
            // node replaces a row_number() (RewriteRankLimitToTopK),
            // LongType from the TopK DataFrame API
            val rank: Any = if (rankIsInt) i + 1 else (i + 1).toLong
            outProj(joined(r, InternalRow(rank))): InternalRow
          }
        }

      if (isPartial) {
        // inline pass-through keeps memory bounded WITHOUT spilling: a row
        // the budget can't admit is simply not reduced on this side. A row
        // of a tracked key whose heap is already FULL is always absorbed —
        // it replaces rather than grows — so `retained` never exceeds the
        // budget (the exact bound, not budget + tracked·(k-1))
        val streamed = iter.flatMap { row =>
          val key = keyProj(row)
          val q = heaps.get(key)
          if ((q != null && q.size() >= limit) || retained < budget) { absorb(key, row); None }
          else {
            passThroughRows += 1
            numOutputRows += 1
            Some(row)
          }
        }
        streamed ++ heaps.values().iterator().asScala.flatMap { q =>
          numOutputRows += q.size()
          q.iterator().asScala
        }
      } else {
        // final pass: exact per-key top-k required — spill sorted runs the
        // moment the budget is reached (regardless of whether the incoming
        // key is tracked), merge at end; `retained` never exceeds the budget
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          if (retained >= budget && !fullHeap(key)) spill()
          absorb(key, row)
        }
        if (spills.isEmpty) {
          rankedOut(heaps.values().iterator().asScala)
        } else {
          // merge N disk runs + the in-memory remainder, all in key-byte
          // order; only the current key's heap is materialized
          final class RunReader(streams: Iterator[(Array[Byte], Array[Byte])]) {
            var cur: (Array[Byte], Array[Byte]) = _
            def advance(): Boolean = {
              if (streams.hasNext) { cur = streams.next(); true } else { cur = null; false }
            }
            advance()
          }
          def fileRecords(f: java.io.File): Iterator[(Array[Byte], Array[Byte])] = {
            val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
              new java.io.FileInputStream(f), 1 << 16))
            new Iterator[(Array[Byte], Array[Byte])] {
              var nextRec: (Array[Byte], Array[Byte]) = read()
              def read(): (Array[Byte], Array[Byte]) = {
                try {
                  val kl = in.readInt(); val kb = new Array[Byte](kl); in.readFully(kb)
                  val rl = in.readInt(); val rb = new Array[Byte](rl); in.readFully(rb)
                  (kb, rb)
                } catch {
                  case _: java.io.EOFException => in.close(); f.delete(); null
                }
              }
              override def hasNext: Boolean = nextRec != null
              override def next(): (Array[Byte], Array[Byte]) = {
                val r = nextRec; nextRec = read(); r
              }
            }
          }
          val memRecords: Iterator[(Array[Byte], Array[Byte])] =
            sortedEntries().iterator.flatMap { case (kb, q) =>
              q.iterator().asScala.map(r => (kb, r.getBytes))
            }
          val readers = (spills.map(fileRecords) :+ memRecords).map(new RunReader(_))
            .filter(_.cur != null)
          val pq = new java.util.PriorityQueue[RunReader](math.max(readers.size, 1),
            new java.util.Comparator[RunReader] {
              override def compare(a: RunReader, b: RunReader): Int =
                cmpBytes(a.cur._1, b.cur._1)
            })
          readers.foreach(pq.add)
          val nRowFields = childOutput.size
          val grouped: Iterator[java.util.PriorityQueue[UnsafeRow]] =
            new Iterator[java.util.PriorityQueue[UnsafeRow]] {
              override def hasNext: Boolean = !pq.isEmpty
              override def next(): java.util.PriorityQueue[UnsafeRow] = {
                val groupKey = pq.peek().cur._1
                val q = new java.util.PriorityQueue[UnsafeRow](limit + 1, worstFirst)
                while (!pq.isEmpty && cmpBytes(pq.peek().cur._1, groupKey) == 0) {
                  val r = pq.poll()
                  val row = new UnsafeRow(nRowFields)
                  row.pointTo(r.cur._2, r.cur._2.length)
                  if (q.size() < limit) q.add(row)
                  else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row) }
                  if (r.advance()) pq.add(r)
                }
                q
              }
            }
          rankedOut(grouped)
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

  /** Install the strategy AND the `row_number() <= k` rewrite rule
    * ([[RewriteRankLimitToTopK]]) — the full automatic path for sessions not
    * built with `withExtensions(new GraftExtensions)`. Idempotent.
    */
  def installAll(spark: SparkSession): Unit = {
    install(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteRankLimitToTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRankLimitToTopK
  }

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
    // same -0.0/NaN key canonicalization as the rewrite rule — raw-byte
    // grouping must match what a window-form equivalent would produce
    val keys = RewriteRankLimitToTopK.normalizeKeys(keyCols.map(attr)).getOrElse(
      throw new IllegalArgumentException(
        s"topKPerKey: keys with nested float/double types are not supported " +
          s"(raw-byte grouping cannot canonicalize -0.0/NaN inside " +
          s"${keyCols.mkString(", ")}); use the window row_number form"))
    SqlBridge.dataFrame(spark,
      TopKPerKey(keys, order, k, rank, analyzed))
  }
}
