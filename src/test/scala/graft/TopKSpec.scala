package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import graft.operators.Windows
import graft.plans.{TopK, TopKPerKeyExec}
import graft.sources.Tables

/** The custom whole-operator extension (TopKPerKey logical node + strategy +
  * partial/final physical operator): result-identical to the window
  * row_number form, structurally sort-free, and skew-bounded by the partial
  * pass.
  */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // finalize any adaptive plan
    df.queryExecution.executedPlan
  }

  test("win_topk_custom equals the window row_number form exactly") {
    val expected = Windows.winTopkGroup(Tables.lineitem(spark, sf)).collect().toSet
    val actual = Windows.winTopkCustom(Tables.lineitem(spark, sf)).collect().toSet
    assert(actual == expected)
  }

  test("plan: partial+final TopKPerKeyExec, no sort, no window, one exchange between them") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Windows.winTopkCustom(Tables.lineitem(spark, sf))
      val plan = df.queryExecution.executedPlan
      val topks = plan.collect { case t: TopKPerKeyExec => t }
      assert(topks.size == 2, s"expected partial+final TopKPerKeyExec:\n$plan")
      assert(topks.count(_.partial) == 1 && topks.count(!_.partial) == 1)
      assert(plan.collect { case s: SortExec => s }.isEmpty,
        s"top-k must not sort the data:\n$plan")
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      // the final consumes the partial through exactly one hash exchange:
      // final -> Exchange -> partial, directly stacked
      val finalNode = topks.find(!_.partial).get
      finalNode.child match {
        case e: ShuffleExchangeExec =>
          assert(e.child.isInstanceOf[TopKPerKeyExec] &&
            e.child.asInstanceOf[TopKPerKeyExec].partial,
            s"partial must feed the exchange directly:\n$plan")
        case other => fail(s"expected Exchange directly under final, got $other:\n$plan")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("ties break deterministically and ranks are dense from 1") {
    val df = Seq(
      ("a", 10L, 1L), ("a", 10L, 2L), ("a", 10L, 3L), ("a", 5L, 4L),
      ("b", 7L, 9L)
    ).toDF("k", "score", "id")
    val out = TopK.topKPerKey(df, Seq("k"), Seq(("score", true), ("id", false)), 2, "r")
      .as[(String, Long, Long, Long)].collect().toSet
    // a: score 10 ties broken by ascending id -> ids 1,2; b: single row
    assert(out == Set(("a", 10L, 1L, 1L), ("a", 10L, 2L, 2L), ("b", 7L, 9L, 1L)))
  }

  test("partial pass bounds rows per key per partition (skew robustness)") {
    // one hot key spread over many partitions: the exchange input after the
    // partial pass must carry at most k rows per key per input partition
    val hot = spark.range(0, 10000, 1, 8)
      .select(lit("hot").as("k"), col("id").as("score"), col("id").as("id"))
    val out = TopK.topKPerKey(hot, Seq("k"), Seq(("score", true), ("id", false)), 3, "r")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("hot", 9999L, 9999L, 1L), ("hot", 9998L, 9998L, 2L),
      ("hot", 9997L, 9997L, 3L)))
  }

  test("rank-limit rewrite: the window row_number form plans through TopKPerKey") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // winTopkGroup is written in the declarative window form — the
      // RewriteRankLimitToTopK rule (installed by SparkTestBase) must swap
      // in the sort-free operator with an identical result
      val df = Windows.winTopkGroup(Tables.lineitem(spark, sf))
      val plan = df.queryExecution.executedPlan
      val topks = plan.collect { case t: TopKPerKeyExec => t }
      assert(topks.size == 2, s"expected rewrite to partial+final TopKPerKeyExec:\n$plan")
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        s"rewritten plan must not contain WindowExec:\n$plan")
      assert(plan.collect { case s: SortExec => s }.isEmpty,
        s"rewritten plan must not sort:\n$plan")
      // keep-first dedup (rn = 1) rewrites too, with the residual select intact
      val dedup = Windows.winDedup(Tables.events(spark, sf))
      val dplan = dedup.queryExecution.executedPlan
      assert(dplan.collect { case t: TopKPerKeyExec => t }.size == 2,
        s"rn = 1 dedup should rewrite:\n$dplan")
      // and a filter with extra conjuncts keeps them as a residual
      val mixed = Tables.lineitem(spark, sf)
        .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("l_suppkey").orderBy(col("l_extendedprice").desc, col("l_partkey"))))
        .where(col("rn") <= 3 && col("l_quantity") > 10)
      val mrows = mixed.collect()
      assert(mixed.queryExecution.executedPlan
        .collect { case t: TopKPerKeyExec => t }.size == 2)
      assert(mrows.forall(r => r.getDouble(r.fieldIndex("l_quantity")) > 10))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("rank-limit rewrite leaves non-matching windows alone") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val base = Seq(("a", 10L, 1L), ("a", 10L, 2L), ("a", 5L, 3L), ("b", 7L, 4L))
        .toDF("k", "score", "id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("score").desc)
      // rank() admits >k rows on ties — MUST stay a window plan
      val ranked = base.withColumn("r", rank().over(w)).where(col("r") <= 1)
      assert(ranked.queryExecution.executedPlan
        .collect { case t: TopKPerKeyExec => t }.isEmpty,
        "rank() must not rewrite (tie semantics differ)")
      assert(ranked.count() == 3) // both score-10 rows of a survive, plus b
      // row_number kept (not filtered) — nothing to rewrite
      val kept = base.withColumn("r", row_number().over(
        w.orderBy(col("score").desc, col("id"))))
      assert(kept.queryExecution.executedPlan
        .collect { case t: TopKPerKeyExec => t }.isEmpty)
      // filter on something other than the rank — no rewrite
      val other = base.withColumn("r", row_number().over(
        w.orderBy(col("score").desc, col("id")))).where(col("score") > 6)
      assert(other.queryExecution.executedPlan
        .collect { case t: TopKPerKeyExec => t }.isEmpty)
      // k above the rewrite guard — stays a window plan
      spark.conf.set("spark.graft.topk.rewriteMaxK", "2")
      val big = base.withColumn("r", row_number().over(
        w.orderBy(col("score").desc, col("id")))).where(col("r") <= 3)
      assert(big.queryExecution.executedPlan
        .collect { case t: TopKPerKeyExec => t }.isEmpty)
      assert(big.count() == 4)
    } finally {
      spark.conf.unset("spark.graft.topk.rewriteMaxK")
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("near-unique keys at a tiny memory budget: spills + pass-through, exact output") {
    // ~50k distinct keys vs a 1000-row budget: the partial pass must fall
    // back to pass-through and the final pass must spill sorted runs and
    // merge them — with the result still exactly the window form's
    spark.conf.set("spark.graft.topk.maxRowsInMemory", "1000")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // AQE wraps stages in AdaptiveSparkPlanExec, hiding the exec nodes from
    // plan.collect — disable so the metrics assertions can find them
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.range(0, 50000, 1, 8).select(
        col("id").as("k"),
        (col("id") % 97).as("score"),
        col("id").as("id"))
      val out = TopK.topKPerKey(df, Seq("k"), Seq(("score", true), ("id", false)), 1, "r")
      val rows = out.collect()
      assert(rows.length == 50000) // every key unique -> one row each, rank 1
      assert(rows.forall(_.getLong(3) == 1L))
      val topks = out.queryExecution.executedPlan.collect { case t: TopKPerKeyExec => t }
      val fin = topks.find(!_.partial).get
      val part = topks.find(_.partial).get
      assert(fin.metrics("spillCount").value > 0,
        s"final pass should have spilled: ${fin.metrics}")
      assert(part.metrics("passThroughRows").value > 0,
        s"partial pass should have passed rows through: ${part.metrics}")
      assert(fin.metrics("numKeys").value == 50000)
      // and a grouped-duplicate workload through the same tiny budget
      val dup = spark.range(0, 30000, 1, 8).select(
        (col("id") % 5000).as("k"), (col("id") % 31).as("score"), col("id").as("id"))
      val got = TopK.topKPerKey(dup, Seq("k"), Seq(("score", true), ("id", false)), 2, "r")
        .as[(Long, Long, Long, Long)].collect().toSet
      val expected = {
        import org.apache.spark.sql.expressions.Window
        dup.withColumn("r", row_number().over(
          Window.partitionBy("k").orderBy(col("score").desc, col("id"))))
          .where(col("r") <= 2).as[(Long, Long, Long, Long)].collect().toSet
      }
      assert(got == expected)
    } finally {
      spark.conf.unset("spark.graft.topk.maxRowsInMemory")
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("spill files live under spark.local.dir and are cleaned up on task end") {
    import org.apache.spark.sql.graftbridge.SqlBridge
    val localDirs = SqlBridge.sparkLocalDirs
    assert(localDirs.nonEmpty, "local-mode SparkEnv should expose local dirs")
    // placement: the allocator hands out paths under Spark's local dirs,
    // not java.io.tmpdir (the r4 finding)
    val probe = SqlBridge.createSpillFile("graft-topk-spill")
    assert(localDirs.exists(d => probe.getAbsolutePath.startsWith(d.getAbsolutePath)),
      s"spill file $probe not under any of ${localDirs.mkString(",")}")
    probe.delete()

    def tempLocalFiles(): Seq[java.io.File] = localDirs.flatMap { d =>
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(d)
    }.filter(_.getName.startsWith("temp_local_")).toSeq

    spark.conf.set("spark.graft.topk.maxRowsInMemory", "1000")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.range(0, 50000, 1, 4).select(
        col("id").as("k"), (col("id") % 97).as("score"), col("id").as("id"))
      val out = TopK.topKPerKey(df, Seq("k"), Seq(("score", true), ("id", false)), 1, "r")
      // drain only ONE row: without the task-completion listener the
      // undrained merge readers would leak their run files until JVM exit
      assert(out.limit(1).collect().length == 1)
      val full = TopK.topKPerKey(df, Seq("k"), Seq(("score", true), ("id", false)), 1, "r")
      assert(full.count() == 50000)
      val fin = executed(full).collect { case t: TopKPerKeyExec if !t.partial => t }.head
      assert(fin.metrics("spillCount").value > 0)
      assert(fin.metrics("spillBytes").value > 0, s"spill bytes metric: ${fin.metrics}")
      val leftover = tempLocalFiles()
      assert(leftover.isEmpty, s"spill files leaked past task end: $leftover")
    } finally {
      spark.conf.unset("spark.graft.topk.maxRowsInMemory")
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("float partition keys: -0.0/0.0 group together (window parity)") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // AQE hides exec nodes from collect
    try {
    // raw-byte grouping would put -0.0 and 0.0 in different groups; the
    // rewrite and the API wrap float keys in NormalizeNaNAndZero
    val df = Seq((-0.0, 1L), (0.0, 2L), (1.5, 3L), (Double.NaN, 4L), (Double.NaN, 5L))
      .toDF("key", "id")
    val viaApi = TopK.topKPerKey(df, Seq("key"), Seq(("id", false)), 1, "r")
    assert(viaApi.count() == 3, "-0.0/0.0 and the NaNs must each collapse to one group")

    import org.apache.spark.sql.expressions.Window
    val viaRewrite = df.withColumn("r",
        row_number().over(Window.partitionBy("key").orderBy("id")))
      .where(col("r") === 1)
    val plan = executed(viaRewrite)
    assert(plan.collect { case t: TopKPerKeyExec => t }.nonEmpty,
      "rewrite should still fire for top-level float keys")
    assert(viaRewrite.count() == 3)

    // nested float keys through the window form: Spark's own
    // NormalizeFloatingNumbers rebuilds the struct with canonical floats
    // (KnownFloatingPointNormalized) before the User-Provided batch, so the
    // rewrite fires and the raw-byte grouping is already canonical
    val nested = df.select(struct(col("key")).as("sk"), col("id"))
    val nestedWin = nested.withColumn("r",
        row_number().over(Window.partitionBy("sk").orderBy("id")))
      .where(col("r") === 1)
    val nestedPlan = executed(nestedWin)
    assert(nestedPlan.collect { case t: TopKPerKeyExec => t }.nonEmpty,
      "normalized nested keys should still rewrite")
    assert(nestedWin.count() == 3)
    // the direct API path sees the RAW attribute (no normalization has run)
    // and must refuse rather than group non-canonical bytes
    intercept[IllegalArgumentException] {
      TopK.topKPerKey(nested, Seq("sk"), Seq(("id", false)), 1, "r")
    }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
