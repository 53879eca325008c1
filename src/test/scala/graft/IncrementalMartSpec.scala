package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, IncrementalMart}
import graft.sources.Tables

/** Incremental refresh of a week-bucketed mart equals the full recompute
  * when the cutoff lies on a bucket boundary — the property the reference's
  * daily lookback+merge loop relies on (CLAUDE.md:66-68).
  */
class IncrementalMartSpec extends SparkTestBase {

  private def weekly(src: DataFrame) = Aggregates.aggWeeklyStats(src)

  test("trailing-window refresh splices to exactly the full recompute") {
    val orders = Tables.orders(spark, sf)
    val full = weekly(orders)

    // a Monday inside the data range = a week-bucket boundary
    val cutoff = to_date(lit("2000-06-05"))
    // "existing" mart state: computed some time ago from the full history
    val existing = full
    val refreshed = IncrementalMart.refreshWindow(
      existing, orders, weekly, col("o_orderdate"), "order_week", cutoff)

    assert(refreshed.exceptAll(full).isEmpty && full.exceptAll(refreshed).isEmpty)
  }

  test("refresh also repairs stale trailing rows (late data arrived)") {
    val orders = Tables.orders(spark, sf)
    val cutoff = to_date(lit("2000-06-05"))
    // stale state: mart built BEFORE the last chunk of source data existed
    val staleSource = orders.where(
      col("o_orderdate") < to_timestamp(lit("2001-01-01 00:00:00")))
    val stale = weekly(staleSource)
    val refreshed = IncrementalMart.refreshWindow(
      stale, orders, weekly, col("o_orderdate"), "order_week", cutoff)
    val full = weekly(orders)
    assert(refreshed.exceptAll(full).isEmpty && full.exceptAll(refreshed).isEmpty)
  }
}
