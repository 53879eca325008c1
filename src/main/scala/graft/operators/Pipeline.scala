package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Num

/** End-to-end training-data curation pipeline (builder brief north star):
  * quality-filter → exact-dedup → language-ID → corpus stats, composed from
  * the individual operators as one declarative plan. Catalyst fuses the
  * scan-side stages (quality metrics, langid scores) into a single pass over
  * the documents; the dedup keeper set is a semi-join on the md5 digest.
  */
object Pipeline {

  /** Kept-corpus summary per (predicted language, quality bucket). */
  def trainingDataCuration(documents: DataFrame): DataFrame = {
    val quality = TextAnalysis.textQuality(documents)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"), col("quality_bucket"))
    val keepers = documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"))
      .select(col("keeper_doc_id").as("doc_id"))
    val langs = TextAnalysis.textLangid(documents)
      .select(col("doc_id"), col("predicted_lang"))
    quality
      .where(col("quality_score") >= 40.0)
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(langs, Seq("doc_id"))
      .groupBy(col("predicted_lang"), col("quality_bucket"))
      .agg(
        count(lit(1)).as("doc_count"),
        Num.ratio(sum(col("n_tokens")), count(lit(1))).as("avg_tokens"))
  }

  /** v2: near-dup-aware curation — exact dedup catches byte-identical copies
    * only; v2 instead drops every non-canonical member of a NEAR-dup cluster
    * ([[Dedup.dedupClusters]]: minhash-LSH candidates → connected
    * components → keep the smallest doc id per cluster). This is the
    * composition a 100-TB curation run actually uses: the cluster state is
    * proportional to the near-dup subgraph, and the drop set applies as one
    * anti-join on the doc id.
    */
  def trainingDataCurationV2(documents: DataFrame): DataFrame = {
    val dropDocs = Dedup.dedupClusters(documents)
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    val quality = TextAnalysis.textQuality(documents)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"), col("quality_bucket"))
    val langs = TextAnalysis.textLangid(documents)
      .select(col("doc_id"), col("predicted_lang"))
    quality
      .where(col("quality_score") >= 40.0)
      .join(dropDocs, Seq("doc_id"), "left_anti")
      .join(langs, Seq("doc_id"))
      .groupBy(col("predicted_lang"), col("quality_bucket"))
      .agg(
        count(lit(1)).as("doc_count"),
        Num.ratio(sum(col("n_tokens")), count(lit(1))).as("avg_tokens"))
  }

  private def curationV2Oracle: String =
    s"""WITH RECURSIVE q0 AS (
       |  SELECT doc_id, text,
       |         string_split(lower(text), ' ') AS toks
       |  FROM documents),
       |quality AS (
       |  SELECT doc_id,
       |         CAST(len(toks) AS BIGINT) AS n_tokens,
       |         LEAST(100.0, GREATEST(0.0,
       |           CAST(len(toks) AS DOUBLE) / 2.0 +
       |           CAST(len(list_intersect(list_distinct(toks), ['the','a','of','and'])) AS BIGINT) * 10.0 +
       |           CAST(len(list_filter(toks, x -> length(x) >= 5)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 30.0)) AS quality_score
       |  FROM q0),
       |bucketed AS (
       |  SELECT doc_id, n_tokens, quality_score,
       |         CASE WHEN quality_score >= 75.0 THEN 'high'
       |              WHEN quality_score >= 40.0 THEN 'medium'
       |              ELSE 'low' END AS quality_bucket
       |  FROM quality),
       |clusters AS (
       |  SELECT doc_id, cluster_id FROM (${Dedup.clustersOracle}) c),
       |langs AS (
       |  SELECT doc_id,
       |    CASE GREATEST(
       |      CAST(len(list_intersect(list_distinct(string_split(lower(text),' ')), ['data','table','window','stream','hash'])) AS BIGINT) * 8 + 0,
       |      CAST(len(list_intersect(list_distinct(string_split(lower(text),' ')), ['the','a','fast','slow','small','big'])) AS BIGINT) * 8 + 1,
       |      CAST(len(list_intersect(list_distinct(string_split(lower(text),' ')), ['sort','merge','join','order','group'])) AS BIGINT) * 8 + 2,
       |      CAST(len(list_intersect(list_distinct(string_split(lower(text),' ')), ['query','row','column','value','filter'])) AS BIGINT) * 8 + 3,
       |      CAST(len(list_intersect(list_distinct(string_split(lower(text),' ')), ['spark','batch','vector','key','line'])) AS BIGINT) * 8 + 4) % 8
       |    WHEN 0 THEN 'de' WHEN 1 THEN 'en' WHEN 2 THEN 'es'
       |    WHEN 3 THEN 'fr' WHEN 4 THEN 'zh' END AS predicted_lang
       |  FROM documents)
       |SELECT predicted_lang, quality_bucket,
       |       COUNT(*) AS doc_count,
       |       CAST(CAST(SUM(n_tokens) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_tokens
       |FROM bucketed
       |JOIN langs USING (doc_id)
       |WHERE quality_score >= 40.0
       |  AND doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id != cluster_id)
       |GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipeline_curation_v2" -> curationV2Oracle,
    "pipeline_training_data" ->
      """WITH q0 AS (
        |  SELECT doc_id, text,
        |         string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |quality AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS BIGINT) AS n_tokens,
        |         LEAST(100.0, GREATEST(0.0,
        |           CAST(len(toks) AS DOUBLE) / 2.0 +
        |           CAST(len(list_intersect(list_distinct(toks), ['the','a','of','and'])) AS BIGINT) * 10.0 +
        |           CAST(len(list_filter(toks, x -> length(x) >= 5)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 30.0)) AS quality_score
        |  FROM q0),
        |bucketed AS (
        |  SELECT doc_id, n_tokens, quality_score,
        |         CASE WHEN quality_score >= 75.0 THEN 'high'
        |              WHEN quality_score >= 40.0 THEN 'medium'
        |              ELSE 'low' END AS quality_bucket
        |  FROM quality),
        |keepers AS (
        |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |langs AS (
        |  SELECT doc_id,
        |    CASE GREATEST(
        |      CAST(len(list_intersect(list_distinct(string_split(lower(text),' ')), ['data','table','window','stream','hash'])) AS BIGINT) * 8 + 0,
        |      CAST(len(list_intersect(list_distinct(string_split(lower(text),' ')), ['the','a','fast','slow','small','big'])) AS BIGINT) * 8 + 1,
        |      CAST(len(list_intersect(list_distinct(string_split(lower(text),' ')), ['sort','merge','join','order','group'])) AS BIGINT) * 8 + 2,
        |      CAST(len(list_intersect(list_distinct(string_split(lower(text),' ')), ['query','row','column','value','filter'])) AS BIGINT) * 8 + 3,
        |      CAST(len(list_intersect(list_distinct(string_split(lower(text),' ')), ['spark','batch','vector','key','line'])) AS BIGINT) * 8 + 4) % 8
        |    WHEN 0 THEN 'de' WHEN 1 THEN 'en' WHEN 2 THEN 'es'
        |    WHEN 3 THEN 'fr' WHEN 4 THEN 'zh' END AS predicted_lang
        |  FROM documents)
        |SELECT predicted_lang, quality_bucket,
        |       COUNT(*) AS doc_count,
        |       CAST(CAST(SUM(n_tokens) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_tokens
        |FROM bucketed
        |JOIN langs USING (doc_id)
        |WHERE quality_score >= 40.0
        |  AND doc_id IN (SELECT doc_id FROM keepers)
        |GROUP BY 1, 2""".stripMargin
  )
}
