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

  /** Day-partitioned backfill (reference scripts/backfill_hn_comments.py:93-199:
    * re-run a list of day partitions, each an independent idempotent job).
    * The Spark-first expression: ONE declarative plan recomputing every
    * requested day from source and splicing over the mart — the days are
    * disjoint partitions of the recompute, so the cluster runs them in
    * parallel without a driver-side loop, and a failed run re-executes
    * idempotently (same splice). With the mart stored partitioned by day,
    * the write side is the selective bucket swap of
    * [[graft.streaming.IncrementalSync.syncOnce]].
    */
  def backfillDays(
      existing: DataFrame,
      source: DataFrame,
      mart: DataFrame => DataFrame,
      sourceDateCol: Column,
      dayCol: String,
      days: Seq[String]): DataFrame = {
    val wanted = days.map(lit(_).cast("date"))
    val recomputed = mart(source.where(to_date(sourceDateCol).isInCollection(wanted)))
    existing.where(!col(dayCol).isInCollection(wanted)).unionByName(recomputed)
  }

  /** `backfill_days`: daily revenue mart with a week of late-arriving data
    * (every 7th order missing for 1996-03-02..08) healed by a day-list
    * backfill; untouched days keep their stale values.
    */
  def backfillDaysQuery(orders: DataFrame): DataFrame = {
    val stale = orders.where(
      col("o_orderkey") % 7 =!= 0 ||
        !to_date(col("o_orderdate")).between(lit("1996-03-02"), lit("1996-03-08")))
    val days = (2 to 8).map(d => f"1996-03-0$d")
    backfillDays(dailyRevenue(stale), orders, dailyRevenue,
      col("o_orderdate"), "day", days)
  }

  private def dailyRevenue(src: DataFrame): DataFrame =
    src.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(
        sum(graft.functions.Num.cents(col("o_totalprice"))).as("revenue_cents"),
        count(lit(1)).as("n_orders"))

  private val weeklySql =
    """SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |       COUNT(*) AS n_orders,
      |       COUNT(DISTINCT o_custkey) AS n_custs""".stripMargin

  private val dailySql =
    """SELECT CAST(o_orderdate AS DATE) AS day,
      |       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |       COUNT(*) AS n_orders""".stripMargin

  private val backfillDayList =
    (2 to 8).map(d => f"DATE '1996-03-0$d'").mkString(", ")

  val oracles: Map[String, String] = Map(
    "backfill_days" ->
      s"""WITH stale AS (
         |  SELECT * FROM orders
         |  WHERE o_orderkey % 7 <> 0
         |     OR NOT (CAST(o_orderdate AS DATE)
         |             BETWEEN DATE '1996-03-02' AND DATE '1996-03-08')),
         |m_stale AS (
         |  $dailySql
         |  FROM stale GROUP BY 1),
         |m_fresh AS (
         |  $dailySql
         |  FROM orders WHERE CAST(o_orderdate AS DATE) IN ($backfillDayList)
         |  GROUP BY 1)
         |SELECT * FROM m_stale WHERE day NOT IN ($backfillDayList)
         |UNION ALL
         |SELECT * FROM m_fresh""".stripMargin,
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
