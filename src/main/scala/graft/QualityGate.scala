package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.quality.Checks
import graft.quality.Checks._
import graft.sources.Tables

/** CLI data-quality gate — the `dbt build` test phase analog: runs the
  * translated schema-test suite against live engine outputs and prints one
  * JSON line; non-zero exit on any violation.
  * Usage: runMain graft.QualityGate [sfDir]
  */
object QualityGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fct = Windows.fctStockPrices(Tables.prices(spark, sfDir)).cache()
    val weekly = Aggregates.aggWeeklyStats(Tables.orders(spark, sfDir))
    val spine = SetOps.unionDistinct(
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir), Tables.events(spark, sfDir))
    val merged = Merge.mergeUpsertQuery(Tables.events(spark, sfDir))
    val li = Tables.lineitem(spark, sfDir)

    val results: Seq[CheckResult] = Seq(
      unique(fct, "ticker", "trade_date"),
      notNull(fct, "close_price"),
      acceptedRange(fct, "position_in_52w_range", 0, 100),
      acceptedValues(fct, "ma_trend", Seq("above_30d_ma", "below_30d_ma", "at_30d_ma")),
      acceptedValues(fct, "volume_trend", Seq("high_volume", "low_volume", "normal_volume")),
      expressionIsTrue(fct, "high>=low", col("high_52w") >= col("low_52w")),
      unique(weekly, "order_week"),
      expressionIsTrue(weekly, "avg<=total", col("avg_order_value") <= col("total_sales")),
      unique(spine, "week"),
      unique(merged, "event_id"),
      relationships(li, "l_orderkey", Tables.orders(spark, sfDir), "o_orderkey"),
      relationships(li, "l_partkey", Tables.part(spark, sfDir), "p_partkey"),
      relationships(li, "l_suppkey", Tables.supplier(spark, sfDir), "s_suppkey"))
    fct.unpersist()

    val failed = results.filterNot(_.passed)
    val detail = results
      .map(r => "\"" + r.name + "\":" + r.violations).mkString("{", ",", "}")
    println(s"""{"metric":"quality_checks","passed":${results.size - failed.size},""" +
      s""""failed":${failed.size},"violations":$detail,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
