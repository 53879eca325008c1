package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental mart maintenance — the reference's freshness model applied at
  * the transform layer (SURVEY §2.10 "Incremental window": per-source
  * lookbacks of 5-90 days re-read a trailing window and upsert idempotently).
  *
  * For a date-keyed mart whose rows depend only on source rows of the same
  * bucket (true for all the reference's weekly/monthly marts), refreshing =
  * recompute the trailing buckets from the trailing source window and splice
  * them over the existing mart. History older than the cutoff is never
  * re-read — at 100 TB a daily refresh touches days, not years, and with the
  * mart stored partitioned by the bucket column the splice is a
  * partition-overwrite, not a rewrite.
  */
object IncrementalMart {

  /** Refresh `existing` (bucketed by `bucketCol`) from the trailing source
    * window: rows with bucket >= cutoff are replaced by `mart(recentSource)`,
    * older rows are kept as-is. `cutoff` must lie on a bucket boundary so a
    * bucket is never split between old and recomputed halves.
    */
  def refreshWindow(
      existing: DataFrame,
      source: DataFrame,
      mart: DataFrame => DataFrame,
      sourceDateCol: Column,
      bucketCol: String,
      cutoff: Column): DataFrame = {
    val recomputed = mart(source.where(sourceDateCol >= cutoff))
    existing.where(col(bucketCol) < cutoff).unionByName(recomputed)
  }

  /** Demo mart for the registered query: weekly order revenue, cents-exact —
    * the shape of the reference's weekly rollup marts (fct_hn_weekly_stats).
    */
  private def weeklyRevenue(src: DataFrame): DataFrame =
    src.groupBy(to_date(date_trunc("week", col("o_orderdate"))).as("week"))
      .agg(
        sum(graft.functions.Num.cents(col("o_totalprice"))).as("revenue_cents"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_custs"))

  /** `incremental_refresh_window` (sources/iowa_liquor.py:19 lookback
    * refresh, CLAUDE.md:66-68): the existing mart is STALE — built from a
    * snapshot missing every 10th order (late-arriving data). The refresh
    * recomputes only weeks >= the cutoff from the now-complete source and
    * splices them over the mart; weeks before the cutoff keep their stale
    * values untouched (never re-read). The cutoff (1997-01-06) lies on a
    * Monday week boundary so no bucket is split.
    */
  def incrementalRefreshWindow(orders: DataFrame): DataFrame = {
    val staleSnapshot = orders.where(col("o_orderkey") % 10 =!= 0)
    refreshWindow(
      existing = weeklyRevenue(staleSnapshot),
      source = orders,
      mart = weeklyRevenue,
      sourceDateCol = col("o_orderdate"),
      bucketCol = "week",
      cutoff = lit("1997-01-06").cast("date"))
  }

  private val weeklySql =
    """SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |       COUNT(*) AS n_orders,
      |       COUNT(DISTINCT o_custkey) AS n_custs""".stripMargin

  val oracles: Map[String, String] = Map(
    "incremental_refresh_window" ->
      s"""WITH stale AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0),
         |m_stale AS (
         |  $weeklySql
         |  FROM stale GROUP BY 1),
         |m_fresh AS (
         |  $weeklySql
         |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-06 00:00:00' GROUP BY 1)
         |SELECT * FROM m_stale WHERE week < DATE '1997-01-06'
         |UNION ALL
         |SELECT * FROM m_fresh""".stripMargin)
}
