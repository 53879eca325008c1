package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, RLike}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import graft.models.TextMarts
import graft.sources.Tables

/** Regression guards for the round-2 plan pathologies (docs/SCALE.md "Plan
  * pathologies"): if a refactor swaps explode_outer back to explode, the
  * inferred size>0 filter re-inlines the whole regex battery into a per-row
  * Filter (measured 3x); if a HOF sneaks into the battery projection, the
  * rlike chain drops out of whole-stage codegen. Assert on the optimized
  * logical plan, where both regressions are visible structurally.
  */
class PlanAuditSpec extends SparkTestBase {

  private def rlikeFilters(df: DataFrame): Seq[Filter] =
    df.queryExecution.optimizedPlan.collect {
      case f: Filter if f.condition.find(_.isInstanceOf[RLike]).isDefined => f
    }

  private def arrayFilterCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan
      .flatMap(_.expressions.flatMap(_.collect { case a: ArrayFilter => a })).size

  test("FDA battery: no RLIKE inside Filter nodes (regexes evaluate once)") {
    val df = TextMarts.fctFdaEventsByReaction(TextMarts.fdaEvents(Tables.events(spark, sf)))
    assert(rlikeFilters(df).isEmpty,
      "InferFiltersFromGenerate re-inlined the symptom battery into a Filter")
  }

  test("HN battery: no RLIKE inside Filter nodes, no HOF in the match plan") {
    val kw = TextMarts.intHnKeywords(Tables.documents(spark, sf))
    assert(rlikeFilters(kw).isEmpty,
      "InferFiltersFromGenerate re-inlined the keyword battery into a Filter")
    assert(arrayFilterCount(kw) == 0,
      "a filter() HOF in the keyword match plan forces interpreted eval")
  }

  test("FDA fct: no HOF in the category-array plan") {
    val df = TextMarts.fctFdaEventsByReaction(TextMarts.fdaEvents(Tables.events(spark, sf)))
    assert(arrayFilterCount(df) == 0,
      "a filter() HOF in the category plan forces interpreted eval")
  }

  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("rank-limit rewrite fires for every query that depends on it") {
    import graft.plans.TopKPerKeyExec
    import org.apache.spark.sql.execution.window.WindowExec
    withoutAqe {
      // the three registry queries whose 100-TB story is the TopKPerKey plan
      // (bounded heaps, no per-partition sort) — a refactor that stops the
      // rewrite from matching silently reverts them to sort-the-world
      val targets: Seq[(String, DataFrame)] = Seq(
        "win_topk_group" -> graft.operators.Windows.winTopkGroup(Tables.lineitem(spark, sf)),
        "cap_per_source" -> graft.operators.Curation.capPerSource(Tables.documents(spark, sf)),
        "dedup_keep_best" -> graft.operators.Dedup.dedupKeepBest(Tables.documents(spark, sf)),
        "knn_graph" -> graft.operators.Similarity.knnGraph(Tables.embeddings(spark, sf)))
      targets.foreach { case (name, df) =>
        val plan = df.queryExecution.executedPlan
        val topks = plan.collect { case t: TopKPerKeyExec => t }
        assert(topks.size >= 2, s"$name lost the TopKPerKey rewrite:\n$plan")
        // other window shapes may legitimately remain (dedup_keep_best keeps
        // a cluster-size count window); what must be gone is the rank window
        // the rewrite replaces
        val rankWindows = plan.collect {
          case w: WindowExec if w.windowExpression.exists(
            _.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.RowNumber])
              .isDefined) => w
        }
        assert(rankWindows.isEmpty,
          s"$name still plans a row_number WindowExec alongside TopKPerKey:\n$plan")
      }
      // sensitivity: the same assertion FAILS when the rewrite is disabled
      // (rewriteMaxK=0 declines every match) — proves the guard can detect
      // a broken rewrite rather than passing vacuously
      spark.conf.set("spark.graft.topk.rewriteMaxK", "0")
      try {
        val broken = graft.operators.Windows.winTopkGroup(Tables.lineitem(spark, sf))
        assert(broken.queryExecution.executedPlan
          .collect { case t: TopKPerKeyExec => t }.isEmpty,
          "rewriteMaxK=0 should disable the rewrite; the guard would be vacuous")
      } finally spark.conf.unset("spark.graft.topk.rewriteMaxK")
    }
  }

  test("hot text/dedup pipelines stay fully codegen (no CodegenFallback expressions)") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    withoutAqe {
      // queries whose per-row cost dominates at 100 TB: a fallback expression
      // here drops the whole projection out of whole-stage codegen (measured
      // 3x on the HOF dot product before RewriteHofDotProduct)
      val hot: Seq[(String, DataFrame)] = Seq(
        "text_fingerprint" -> graft.operators.TextAnalysis.textFingerprint(Tables.documents(spark, sf)),
        "text_token_count" -> graft.operators.TextAnalysis.textTokenCount(Tables.documents(spark, sf)),
        "text_langid" -> graft.operators.TextAnalysis.textLangid(Tables.documents(spark, sf)),
        "dedup_minhash_lsh_fast" -> graft.operators.Dedup.dedupMinhashLsh(
          Tables.documents(spark, sf), fastHash = true),
        "dedup_simhash_fast" -> graft.operators.Dedup.dedupSimhash(
          Tables.documents(spark, sf), fastHash = true),
        "embed_norm_stats" -> graft.operators.CorpusStats.embedNormStats(
          Tables.embeddings(spark, sf)))
      hot.foreach { case (name, df) =>
        val fallbacks = df.queryExecution.executedPlan.flatMap(
          _.expressions.flatMap(_.collect { case e: CodegenFallback => e }))
        assert(fallbacks.isEmpty,
          s"$name has CodegenFallback expressions ${fallbacks.map(_.getClass.getSimpleName).distinct}")
      }
    }
  }

  test("sessionize_batch plans exactly one exchange (groupBy reuses the window's partitioning)") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.streaming.Sessionize.sessionizeBatch(Tables.events(spark, sf))
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"expected hash(user_id) to satisfy groupBy(user_id, session_idx); got " +
          s"${exchanges.size} exchanges:\n${df.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
