package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Pluggable driver-side API sources (SURVEY.md §2.1 `api_paginate_*`,
  * `api_early_stop`; reference lib/source.py:18-44 Source ABC). API ingestion
  * is inherently driver-side in the reference (HTTP pagination loops); the
  * engine models it as a deterministic `Iterator[Row]` producer feeding
  * `spark.createDataFrame` — the distributed plan starts at the DataFrame
  * boundary, exactly like the reference's load step. The fake API is a pure
  * function of the row index so the DuckDB oracle can replay it with
  * `range()`.
  *
  * Record shape: id ∈ [0, total), score = (id*37) % 100,
  * updated_day = total - id (sorted desc by freshness, like GitHub's
  * `sort=updated desc`), updated_at = 2020-01-01 + updated_day days.
  */
object ApiSource {
  val Total = 1000

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", LongType, nullable = false),
    StructField("updated_day", LongType, nullable = false)))

  private def record(i: Long): Row = Row(i, (i * 37) % 100, (Total - i).toLong)

  /** GraphQL cursor pagination (sources/linear.py:93-136): opaque cursor =
    * last id; loop while hasNextPage.
    */
  def fetchCursor(pageSize: Int = 100): Seq[Row] = {
    val out = Seq.newBuilder[Row]
    var cursor = 0L
    var hasNext = true
    while (hasNext) {
      val page = (cursor until math.min(cursor + pageSize, Total.toLong)).map(record)
      out ++= page
      cursor += pageSize
      hasNext = cursor < Total
    }
    out.result()
  }

  /** REST page-number pagination with Link-header next detection
    * (sources/github.py:73-111); page size 120, page_no recorded.
    */
  def fetchLink(pageSize: Int = 120): Seq[(Row, Long)] = {
    val out = Seq.newBuilder[(Row, Long)]
    var page = 0L
    var more = true
    while (more) {
      val start = page * pageSize
      val rows = (start until math.min(start + pageSize, Total.toLong)).map(record)
      out ++= rows.map(r => (r, page))
      more = (page + 1) * pageSize < Total
      page += 1
    }
    out.result()
  }

  /** next_token pagination (sources/oura.py:37-77); token = next offset. */
  def fetchToken(pageSize: Int = 77): Seq[(Row, Long)] = {
    val out = Seq.newBuilder[(Row, Long)]
    var token: Option[Long] = Some(0L)
    var pageNo = 0L
    while (token.isDefined) {
      val start = token.get
      val rows = (start until math.min(start + pageSize, Total.toLong)).map(record)
      out ++= rows.map(r => (r, pageNo))
      val next = start + pageSize
      token = if (next < Total) Some(next) else None
      pageNo += 1
    }
    out.result()
  }

  /** Early-terminating pagination on updated-desc order
    * (sources/github.py:236-267): stop at the first row older than cutoff —
    * whole pages after it are never fetched.
    */
  def fetchEarlyStop(cutoffDay: Long, pageSize: Int = 100): Seq[Row] = {
    val out = Seq.newBuilder[Row]
    var cursor = 0L
    var stop = false
    while (!stop && cursor < Total) {
      val page = (cursor until math.min(cursor + pageSize, Total.toLong)).map(record)
      val fresh = page.takeWhile(r => r.getLong(2) >= cutoffDay)
      out ++= fresh
      stop = fresh.size < page.size
      cursor += pageSize
    }
    out.result()
  }

  private def withDate(spark: SparkSession, rows: Seq[Row]): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    df.withColumn("updated_at",
      date_add(to_date(lit("2020-01-01")), col("updated_day").cast("int")))
  }

  def cursorDf(spark: SparkSession): DataFrame = withDate(spark, fetchCursor())

  def linkDf(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val rows = fetchLink().map { case (r, p) => Row(r.getLong(0), r.getLong(1), r.getLong(2), p) }
    val s = StructType(schema.fields :+ StructField("page_no", LongType, nullable = false))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), s)
      .withColumn("updated_at", date_add(to_date(lit("2020-01-01")), col("updated_day").cast("int")))
  }

  def tokenDf(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val rows = fetchToken().map { case (r, p) => Row(r.getLong(0), r.getLong(1), r.getLong(2), p) }
    val s = StructType(schema.fields :+ StructField("token_page", LongType, nullable = false))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), s)
      .withColumn("updated_at", date_add(to_date(lit("2020-01-01")), col("updated_day").cast("int")))
  }

  def earlyStopDf(spark: SparkSession, cutoffDay: Long = 300L): DataFrame =
    withDate(spark, fetchEarlyStop(cutoffDay))

  val oracles: Map[String, String] = Map(
    "api_paginate_cursor" ->
      """SELECT i AS id, (i * 37) % 100 AS score, 1000 - i AS updated_day,
        |       DATE '2020-01-01' + CAST(1000 - i AS INTEGER) AS updated_at
        |FROM range(0, 1000) t(i)""".stripMargin,
    "api_paginate_link" ->
      """SELECT i AS id, (i * 37) % 100 AS score, 1000 - i AS updated_day,
        |       i // 120 AS page_no,
        |       DATE '2020-01-01' + CAST(1000 - i AS INTEGER) AS updated_at
        |FROM range(0, 1000) t(i)""".stripMargin,
    "api_paginate_token" ->
      """SELECT i AS id, (i * 37) % 100 AS score, 1000 - i AS updated_day,
        |       i // 77 AS token_page,
        |       DATE '2020-01-01' + CAST(1000 - i AS INTEGER) AS updated_at
        |FROM range(0, 1000) t(i)""".stripMargin,
    "api_early_stop" ->
      """SELECT i AS id, (i * 37) % 100 AS score, 1000 - i AS updated_day,
        |       DATE '2020-01-01' + CAST(1000 - i AS INTEGER) AS updated_at
        |FROM range(0, 1000) t(i)
        |WHERE 1000 - i >= 300""".stripMargin
  )
}
