package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Num

/** Readers for the driver's synthetic tables (/root/repo/TESTDATA.md) plus
  * reference-shaped adapter views (FIXTURES.md §3): the TPC-H-ish star schema
  * plays the roles of the reference's source tables (stocks daily prices,
  * trends interest series, event streams, text corpora).
  *
  * Scale notes: every adapter is a pure projection/aggregation on the scan —
  * Catalyst pushes filters and column pruning into the parquet reader, and the
  * groupBy adapters shuffle once on their natural key, which downstream window
  * operators reuse (partitionBy the same key ⇒ no extra exchange).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")

  /** events.parquet's physical `ts` encoding has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
    * without the legacy nanos-as-long conf), plain timestamp[us] without
    * UTC adjustment (read as TIMESTAMP_NTZ), or an adjusted timestamp.
    * Adapt on the loaded dtype so every generation normalizes to a session
    * TIMESTAMP identical to DuckDB's `CAST(ts AS TIMESTAMP)` under the UTC
    * session TZ: nanos-long → exact integer division to micros; NTZ → cast
    * (wall time reinterpreted in the UTC session TZ = same micros value);
    * TIMESTAMP → pass through.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** stocks.raw_prices-shaped daily series (reference sources/stocks.py:48-60):
    * one row per (ticker, trade_date), suppliers as tickers. Exact integer
    * cents per Num's cross-engine scheme. ~100 tickers × ~600 days at sf0.01.
    */
  def prices(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .groupBy(
        col("l_suppkey").as("ticker"),
        to_date(col("l_shipdate")).as("trade_date"))
      .agg(
        sum(Num.cents(col("l_extendedprice"))).as("close_cents"),
        max(Num.cents(col("l_extendedprice"))).as("high_cents"),
        min(Num.cents(col("l_extendedprice"))).as("low_cents"),
        sum(Num.asLong(col("l_quantity"))).as("volume"))

  /** Shared oracle CTE for [[prices]]. */
  val pricesSql: String =
    """prices AS (
      |  SELECT l_suppkey AS ticker,
      |         CAST(l_shipdate AS DATE) AS trade_date,
      |         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS close_cents,
      |         MAX(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS high_cents,
      |         MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS low_cents,
      |         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS volume
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** trends.raw_interest_over_time-shaped series (reference
    * sources/trends.py:47-55): one row per (keyword, date), event types as
    * keywords, daily event count as integer interest.
    */
  def trends(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("event_type").as("keyword"), to_date(col("ts")).as("date"))
      .agg(count(lit(1)).as("interest"))

  /** Shared oracle CTE for [[trends]]. */
  val trendsSql: String =
    """trends AS (
      |  SELECT event_type AS keyword, CAST(ts AS DATE) AS date,
      |         COUNT(*) AS interest
      |  FROM events GROUP BY 1, 2)""".stripMargin
}
