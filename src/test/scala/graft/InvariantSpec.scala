package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows
import graft.quality.Checks
import graft.quality.Checks._
import graft.sources.Tables

/** The reference's dbt schema tests, re-expressed as engine checks and run
  * against the engine's own mart outputs on sf0.001 (SURVEY §5.1/5.2 —
  * "invariant checks on live data", e.g. stocks marts
  * dbt/models/marts/stocks/_stocks__models.yml:38-105).
  */
class InvariantSpec extends SparkTestBase {

  test("fct_stock_prices satisfies the translated dbt test suite") {
    val fct = Windows.fctStockPrices(Tables.prices(spark, sf)).cache()
    try Checks.assertAll(Seq(
      unique(fct, "ticker", "trade_date"),
      notNull(fct, "ticker"),
      notNull(fct, "trade_date"),
      notNull(fct, "close_price"),
      acceptedRange(fct, "position_in_52w_range", 0, 100),
      acceptedValues(fct, "ma_trend", Seq("above_30d_ma", "below_30d_ma", "at_30d_ma")),
      acceptedValues(fct, "volume_trend", Seq("high_volume", "low_volume", "normal_volume")),
      expressionIsTrue(fct, "recency_rank >= 1", col("recency_rank") >= 1),
      expressionIsTrue(fct, "high >= low", col("high_52w") >= col("low_52w")),
      expressionIsTrue(fct, "ma7 between 52w extrema",
        col("ma_7d") >= col("low_52w") && col("ma_7d") <= col("high_52w"))
    ))
    finally fct.unpersist()
  }

  test("relationships: lineitem fks resolve against dims") {
    val li = Tables.lineitem(spark, sf)
    Checks.assertAll(Seq(
      relationships(li, "l_partkey", Tables.part(spark, sf), "p_partkey"),
      relationships(li, "l_suppkey", Tables.supplier(spark, sf), "s_suppkey"),
      relationships(li, "l_orderkey", Tables.orders(spark, sf), "o_orderkey")))
  }

  test("aggregate marts hold their dbt-style invariants") {
    val weekly = graft.operators.Aggregates.aggWeeklyStats(Tables.orders(spark, sf))
    Checks.assertAll(Seq(
      unique(weekly, "order_week"),
      notNull(weekly, "order_week"),
      expressionIsTrue(weekly, "count positive", col("order_count") > 0),
      expressionIsTrue(weekly, "avg <= total", col("avg_order_value") <= col("total_sales")),
      expressionIsTrue(weekly, "distinct <= count",
        col("distinct_customers") <= col("order_count"))))

    val topk = graft.operators.Joins.joinTopkBack(
      Tables.lineitem(spark, sf), Tables.part(spark, sf))
    Checks.assertAll(Seq(
      unique(topk, "brand"),
      expressionIsTrue(topk, "top part cannot exceed brand total",
        col("top_part_revenue") <= col("brand_revenue"))))

    val merged = graft.operators.Merge.mergeUpsertQuery(Tables.events(spark, sf))
    Checks.assertAll(Seq(unique(merged, "event_id"), notNull(merged, "event_id")))
  }

  test("oura-style spine mart: week unique, counts non-negative") {
    val spine = graft.operators.SetOps.unionDistinct(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf), Tables.events(spark, sf))
    Checks.assertAll(Seq(
      unique(spine, "week"),
      notNull(spine, "week"),
      expressionIsTrue(spine, "counts >= 0 when present",
        coalesce(col("orders_placed"), lit(0L)) >= 0 &&
          coalesce(col("lines_shipped"), lit(0L)) >= 0)))
  }

  test("gap-filled series: dense unique spine, non-negative fills") {
    val gap = graft.operators.Reshape.tsGapfill(Tables.events(spark, sf)).cache()
    try {
      Checks.assertAll(Seq(
        unique(gap, "event_type", "day"),
        notNull(gap, "event_type"),
        notNull(gap, "day"),
        expressionIsTrue(gap, "counts non-negative", col("n_events") >= 0)))
      // density: |rows| must be exactly |types| x |days of the range|
      val types = gap.select("event_type").distinct().count()
      val days = gap.select("day").distinct().count()
      assert(gap.count() == types * days,
        s"spine not dense: ${gap.count()} rows vs $types types x $days days")
    } finally gap.unpersist()
  }

  test("BPE token budgets: one non-negative row per document") {
    val docs = Tables.documents(spark, sf)
    val budget = graft.operators.TextAnalysis.bpeTokenCount(docs).cache()
    try {
      Checks.assertAll(Seq(
        unique(budget, "doc_id"),
        notNull(budget, "n_bpe_tokens"),
        expressionIsTrue(budget, "budgets non-negative", col("n_bpe_tokens") >= 0)))
      // coverage: unique doc_id + equal cardinality == every doc has a row
      // (a relationships() fk check would be a same-lineage self-join here)
      assert(budget.count() == docs.count(),
        "the budget ledger must cover every document")
    } finally budget.unpersist()
  }
}
