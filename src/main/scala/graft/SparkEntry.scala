package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One `queries` entry per implemented operator ID from SURVEY.md §2; each has
  * value-identical DuckDB oracle SQL in [[Oracles]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * fct_stock_prices semantics (SURVEY §7.2): scan → keyed aggregation →
    * four window shapes → safe-divide pct metrics → trend buckets.
    */
  def entry(spark: SparkSession): DataFrame =
    Windows.fctStockPrices(Tables.prices(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5 windows
    "fct_stock_prices" -> ((s, d) => Windows.fctStockPrices(Tables.prices(s, d))),
    "win_lag1" -> ((s, d) => Windows.winLag1(Tables.prices(s, d))),
    "win_lag_n" -> ((s, d) => Windows.winLagN(Tables.trends(s, d))),
    "win_rolling_avg" -> ((s, d) => Windows.winRollingAvg(Tables.prices(s, d))),
    "win_rolling_extrema" -> ((s, d) => Windows.winRollingExtrema(Tables.prices(s, d))),
    "win_recency_rank" -> ((s, d) => Windows.winRecencyRank(Tables.prices(s, d))),
    "win_centered" -> ((s, d) => Windows.winCentered(Tables.trends(s, d))),
    "win_dedup" -> ((s, d) => Windows.winDedup(Tables.events(s, d))),
    "win_topk_group" -> ((s, d) => Windows.winTopkGroup(Tables.lineitem(s, d)))
  )

  def oracleSql: Map[String, String] = Oracles.all
}
