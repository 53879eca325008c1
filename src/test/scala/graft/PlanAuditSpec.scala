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
