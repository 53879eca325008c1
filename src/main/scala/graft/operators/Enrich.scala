package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Enrichment UDF surface (SURVEY.md §2.11).
  *
  * The reference's sentiment enrichment calls an external model API
  * (sources/hacker_news.py:131-229); SURVEY §7.5.8 requires the engine's
  * version to be a pure function so it is oracle-able and replayable. The
  * scorer here is a deterministic lexicon model with the reference's exact
  * output contract — (score DOUBLE, label STRING, category STRING), signed
  * score, ±0.25 category thresholds, NEUTRAL for short texts, 1000-char
  * truncation (scoring rules sources/hacker_news.py:186-207).
  *
  * Registered as a real Scala UDF returning a struct (the reference's one
  * true UDF); everything else in the engine stays native Catalyst. The UDF is
  * a black box to Catalyst — it sits after the scan (no pushdown through it)
  * and costs serialization per row; acceptable for one enrichment column, and
  * batch-amortizable via mapPartitions if an external service ever returns.
  */
object Enrich {

  private val positive = Set("fast", "good", "big", "value", "spark", "merge")
  private val negative = Set("slow", "small", "dup", "error", "filter")

  /** Pure scorer: (score, label, category) — referentially transparent. */
  def scoreSentiment(text: String): (Double, String, String) = {
    if (text == null) return (0.0, "NEUTRAL", "neutral")
    val t = if (text.length > 1000) text.substring(0, 1000) else text
    val tokens = t.toLowerCase.split(" ", -1)
    val p = tokens.count(positive.contains)
    val n = tokens.count(negative.contains)
    val score = if (p + n == 0) 0.0 else (p - n).toDouble / (p + n).toDouble
    val label = if (score > 0) "POSITIVE" else if (score < 0) "NEGATIVE" else "NEUTRAL"
    val category =
      if (t.length < 10) "neutral"
      else if (score >= 0.25) "positive"
      else if (score <= -0.25) "negative"
      else "neutral"
    (score, label, category)
  }

  /** `udf_sentiment`: enrich documents with the struct-returning Scala UDF. */
  def udfSentiment(documents: DataFrame): DataFrame =
    documents
      .withColumn("s", udf((text: String) => scoreSentiment(text)).apply(col("text")))
      .select(
        col("doc_id"),
        col("s._1").as("sentiment_score"),
        col("s._2").as("sentiment_label"),
        col("s._3").as("sentiment_category"))

  /** `udf_clean_html` (sources/hacker_news.py:118-128 + stg_hn__comments.sql:21-24):
    * strip tags, then entities, then collapse whitespace — pure Catalyst
    * expression chain (no UDF needed; codegen keeps it in the scan stage).
    */
  def udfCleanHtml(part: DataFrame): DataFrame = {
    val html = concat(lit("<p>"), col("p_name"), lit(" &amp; <b>"), col("p_brand"),
      lit("</b></p>"))
    part.select(
      col("p_partkey").as("part_id"),
      html.as("raw_html"),
      trim(regexp_replace(
        regexp_replace(
          regexp_replace(html, "<[^>]+>", " "),
          "&[a-z]+;", " "),
        " +", " ")).as("clean_text"))
  }

  /** `udf_issue_type` (pages/1_Linear_Issues.py:273): row-wise label
    * derivation (pandas apply → when chain).
    */
  def udfIssueType(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      when(col("event_type") === "error", "Bug")
        .when(col("value") > 100.0, "Feature")
        .otherwise("Chore").as("issue_type"))

  val oracles: Map[String, String] = Map(
    "udf_sentiment" ->
      """WITH t AS (
        |  SELECT doc_id, substr(text, 1, 1000) AS t, length(text) AS full_len
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, t, full_len,
        |         len(list_filter(string_split(lower(t), ' '),
        |             x -> x IN ('fast', 'good', 'big', 'value', 'spark', 'merge'))) AS p,
        |         len(list_filter(string_split(lower(t), ' '),
        |             x -> x IN ('slow', 'small', 'dup', 'error', 'filter'))) AS n
        |  FROM t),
        |s AS (
        |  SELECT doc_id, t,
        |         CASE WHEN p + n = 0 THEN 0.0
        |              ELSE CAST(p - n AS DOUBLE) / CAST(p + n AS DOUBLE) END AS score
        |  FROM c)
        |SELECT doc_id, score AS sentiment_score,
        |       CASE WHEN score > 0 THEN 'POSITIVE'
        |            WHEN score < 0 THEN 'NEGATIVE'
        |            ELSE 'NEUTRAL' END AS sentiment_label,
        |       CASE WHEN length(t) < 10 THEN 'neutral'
        |            WHEN score >= 0.25 THEN 'positive'
        |            WHEN score <= -0.25 THEN 'negative'
        |            ELSE 'neutral' END AS sentiment_category
        |FROM s""".stripMargin,
    "udf_clean_html" ->
      """WITH h AS (
        |  SELECT p_partkey AS part_id,
        |         '<p>' || p_name || ' &amp; <b>' || p_brand || '</b></p>' AS raw_html
        |  FROM part)
        |SELECT part_id, raw_html,
        |       trim(regexp_replace(regexp_replace(regexp_replace(
        |         raw_html, '<[^>]+>', ' ', 'g'), '&[a-z]+;', ' ', 'g'), ' +', ' ', 'g')) AS clean_text
        |FROM h""".stripMargin,
    "udf_issue_type" ->
      """SELECT event_id,
        |       CASE WHEN event_type = 'error' THEN 'Bug'
        |            WHEN value > 100.0 THEN 'Feature'
        |            ELSE 'Chore' END AS issue_type
        |FROM events""".stripMargin
  )
}
