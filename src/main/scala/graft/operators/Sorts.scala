package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Num

/** Sort / limit / top-k operators (SURVEY.md §2.6). Spark's orderBy+limit is
  * planned as TakeOrderedAndProject — a per-partition top-k plus a driver-side
  * k-merge, no full sort or single-reducer shuffle, so it scales to any input
  * size for small k. Ties carry explicit key tiebreakers (SURVEY §7.5.5).
  */
object Sorts {

  /** `sort_model_output` (fct_hn_domain_stats.sql:28): materialized ORDER BY tail. */
  def sortModelOutput(orders: DataFrame): DataFrame =
    orders
      .groupBy(to_date(date_trunc("week", col("o_orderdate"))).as("order_week"))
      .agg(count(lit(1)).as("order_count"),
        Num.dollars(sum(Num.cents(col("o_totalprice")))).as("total_sales"))
      .orderBy(col("order_week").desc)

  /** `topk_nlargest` (pages/10_Stock_Prices.py:225-243): top-5 / bottom-5
    * movers with a direction label; deterministic via key tiebreak.
    */
  def topkNlargest(lineitem: DataFrame): DataFrame = {
    val spend = lineitem
      .groupBy(col("l_suppkey").as("supplier_id"))
      .agg(sum(Num.cents(col("l_extendedprice"))).as("spend_cents"))
    val top = spend.orderBy(col("spend_cents").desc, col("supplier_id")).limit(5)
      .withColumn("direction", lit("top"))
    val bottom = spend.orderBy(col("spend_cents").asc, col("supplier_id")).limit(5)
      .withColumn("direction", lit("bottom"))
    top.unionByName(bottom)
      .select(col("supplier_id"), Num.dollars(col("spend_cents")).as("total_spend"),
        col("direction"))
  }

  /** `limit_param` (sources/hacker_news.py:303-325): parameterized top-N rows
    * per day (rank_in_day <= N), N = 10.
    */
  def limitParam(events: DataFrame, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(to_date(col("ts")))
      .orderBy(col("value").desc, col("event_id"))
    events
      .withColumn("rank_in_day", row_number().over(w))
      .where(col("rank_in_day") <= topN)
      .select(to_date(col("ts")).as("event_date"), col("event_id"),
        col("value"), col("rank_in_day").cast("long").as("rank_in_day"))
  }

  val oracles: Map[String, String] = Map(
    "sort_model_output" ->
      """SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS order_week,
        |       COUNT(*) AS order_count,
        |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_sales
        |FROM orders GROUP BY 1 ORDER BY order_week DESC""".stripMargin,
    "topk_nlargest" ->
      """WITH spend AS (
        |  SELECT l_suppkey AS supplier_id,
        |         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
        |  FROM lineitem GROUP BY 1),
        |top AS (
        |  SELECT supplier_id, spend_cents, 'top' AS direction FROM spend
        |  ORDER BY spend_cents DESC, supplier_id LIMIT 5),
        |bottom AS (
        |  SELECT supplier_id, spend_cents, 'bottom' AS direction FROM spend
        |  ORDER BY spend_cents ASC, supplier_id LIMIT 5)
        |SELECT supplier_id, CAST(spend_cents AS DOUBLE) / 100.0 AS total_spend, direction
        |FROM (SELECT * FROM top UNION ALL SELECT * FROM bottom)""".stripMargin,
    "limit_param" ->
      """WITH ranked AS (
        |  SELECT CAST(ts AS DATE) AS event_date, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
        |                            ORDER BY value DESC, event_id) AS rank_in_day
        |  FROM events)
        |SELECT event_date, event_id, value, rank_in_day
        |FROM ranked WHERE rank_in_day <= 10""".stripMargin
  )
}
