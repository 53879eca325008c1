package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-format ingestion round trips — the CSV / JSON-lines half of the
  * source surface (the parquet half is [[Tables]]; the HTTP half is
  * [[ApiSource]]). Each demo WRITES the canonical table to a scratch sink
  * in the text format and reads it back with an EXPLICIT schema and
  * `mode=FAILFAST`, so the registered query exercises the real parser and
  * its failure contract, and the DuckDB oracle (over the original parquet)
  * proves the round trip is value-exact.
  *
  * Determinism: round-tripped columns are integers/strings (money goes
  * through exact cents) — text formats re-parse those bit-identically;
  * raw doubles through decimal text are the one thing this discipline
  * avoids. Schema-on-read with FAILFAST is the production contract at
  * 100 TB: schema inference is a full extra pass over the data, and
  * PERMISSIVE's silent nulls turn format drift into data corruption.
  */
object FileFormats {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value_cents", LongType)))

  private def canonical(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"), col("event_type"),
      graft.functions.Num.cents(col("value")).as("value_cents"))

  /** `csv_ingest`: CSV with header + explicit NULL token, FAILFAST parse. */
  def csvIngest(spark: SparkSession, events: DataFrame): DataFrame = {
    val path = graft.Scratch.dir(spark, "csv_ingest")
    canonical(events).write.mode("overwrite")
      .option("header", "true").option("nullValue", "\\N")
      .csv(path)
    spark.read.schema(schema)
      .option("header", "true").option("nullValue", "\\N")
      .option("mode", "FAILFAST")
      .csv(path)
  }

  /** `json_ingest`: JSON lines, FAILFAST parse against the declared schema. */
  def jsonIngest(spark: SparkSession, events: DataFrame): DataFrame = {
    val path = graft.Scratch.dir(spark, "json_ingest")
    canonical(events).write.mode("overwrite").json(path)
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)
  }

  /** `orc_ingest`: ORC round trip. Unlike the text formats, ORC carries its
    * own schema + column statistics, so the explicit read schema acts as a
    * contract ASSERTION (names/types must line up) rather than inference
    * avoidance; predicate pushdown against ORC row-group stats works the
    * same way it does for parquet.
    */
  def orcIngest(spark: SparkSession, events: DataFrame): DataFrame = {
    val path = graft.Scratch.dir(spark, "orc_ingest")
    canonical(events).write.mode("overwrite").orc(path)
    spark.read.schema(schema).orc(path)
  }

  private val roundTripOracle =
    """SELECT event_id, user_id, event_type,
      |       CAST(ROUND(value * 100) AS BIGINT) AS value_cents
      |FROM events""".stripMargin

  val oracles: Map[String, String] = Map(
    // both round trips must land exactly the canonical projection
    "csv_ingest" -> roundTripOracle,
    "json_ingest" -> roundTripOracle,
    "orc_ingest" -> roundTripOracle)
}
