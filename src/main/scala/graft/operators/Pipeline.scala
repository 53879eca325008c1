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

  /** Shard count / per-source cap for [[pretrainShards]] — shared with the
    * oracle so the registered query and its SQL cannot silently diverge.
    */
  private[operators] val PretrainShardCount = 8
  private[operators] val PretrainSourceCap = 120

  /** Kept-corpus summary per (predicted language, quality bucket). */
  def trainingDataCuration(documents: DataFrame): DataFrame = {
    val quality = TextAnalysis.textQuality(documents)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"), col("quality_bucket"))
    val keepers = Dedup.dedupExact(documents)
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

  /** v3 — the full pretraining-shard manifest: quality floor → exact-dedup
    * keepers → benchmark DECONTAMINATION (drop both the held-out benchmark
    * docs and every corpus doc whose 3-gram shingle overlap with them is
    * ≥ 20% — the `contamination_check` criterion as a filter instead of a
    * report) → per-source cap (hash-ordered, skew-proof) → deterministic
    * shard assignment, summarized per shard. This is the end-to-end
    * composition a pretraining run executes before writing shards; every
    * stage is one of the registry's own operators, fused by Catalyst into:
    * one corpus scan feeding quality + shingle projections, one broadcast
    * semi/anti pair for dedup + decontamination, one (source) window for
    * the cap, one final shard aggregate. The per-shard row (docs, tokens,
    * sources) is the manifest trainers read to size epochs.
    */
  def pretrainShards(documents: DataFrame, nShards: Int = PretrainShardCount,
      cap: Int = PretrainSourceCap): DataFrame = {
    import graft.functions.PortableHash
    import org.apache.spark.sql.expressions.Window
    val quality = TextAnalysis.textQuality(documents)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val keepers = Dedup.dedupExact(documents)
      .select(col("keeper_doc_id").as("doc_id"))
    val contaminated = Curation.contaminationCheck(documents)
      .where(col("contamination_rate") >= 0.2)
      .select(col("doc_id"))
    val kept = quality
      .where(col("quality_score") >= 40.0 && pmod(col("doc_id"), lit(97)) =!= 0)
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
    val w = Window.partitionBy("source").orderBy(col("pick"), col("doc_id"))
    val capped = kept
      .withColumn("pick",
        PortableHash.hash32(concat(lit("cap:"), col("doc_id").cast("string"))))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= cap)
    capped
      .withColumn("shard",
        pmod(PortableHash.hash32(concat(lit("shuf:"), col("doc_id").cast("string"))),
          lit(nShards.toLong)))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("doc_count"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("source")).as("n_sources"))
  }

  /** v4 — model-gated curation (the DCLM/FineWeb-Edu recipe): the hashed-
    * feature classifier ([[TextAnalysis.qualityClassifierScore]]) gates the
    * corpus instead of the heuristic score, exact-dedup keeps one copy per
    * digest, the training holdout is excluded from the deliverable (it must
    * stay clean for the NEXT classifier generation), and the output is the
    * per-source manifest a mix planner consumes. Plan shape at 100 TB: the
    * broadcast-model scoring fuses into the scan (zero exchanges of its
    * own), so the whole pipeline pays exactly the dedup digest shuffle plus
    * the final per-source aggregate.
    */
  def modelCuration(documents: DataFrame): DataFrame = {
    val scored = TextAnalysis.qualityClassifierScore(documents)
    val keepers = Dedup.dedupExact(documents)
      .select(col("keeper_doc_id").as("doc_id"))
    scored
      .where(col("kept") && !col("is_holdout"))
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("doc_count"),
        sum(col("n_tokens")).as("total_tokens"),
        expr("sum(score_ppm) div count(1)").as("avg_score_ppm"))
  }

  /** v5 — domain-mix MATERIALIZATION (closing the DoReMi-style loop that
    * `mix_plan_by_domain` plans): the learned domain classifier assigns
    * every doc a domain, the equal-share epoch arithmetic turns classified
    * token counts into per-domain epoch weights, and the weighted-mix copy
    * rule ([[Curation.sampleWeightedMix]]'s floor-plus-hashed-fraction
    * fan-out, here in ppm) realizes the mix. Output is the per-domain
    * realized-mix manifest: in expectation every domain's `tokens_out`
    * lands on the equal share, which is the property the planner promised.
    *
    * 100-TB shape: assign is the zero-exchange frozen-model projection; the
    * epoch table is ≤ |domains| rows broadcast back onto the corpus (no
    * shuffle of corpus rows); the copy fan-out is a per-row
    * `explode(sequence)`; the only corpus-sized shuffle is the final
    * per-domain aggregate, which map-side-combines to ≤ |domains| rows per
    * task.
    */
  /** Per-document copy ceiling for [[domainMix]] — bounds the
    * `explode(sequence)` fan-out (scale guard) and the over-epoching of
    * starved domains (quality guard). Mirrored in the DuckDB oracle.
    */
  val MaxEpochs: Long = 100L

  def domainMix(documents: DataFrame): DataFrame = {
    import graft.functions.PortableHash
    // the assign projection feeds BOTH the epoch aggregate and the fan-out
    // branch; staged (CacheScope: cache locally, parquet beyond the auto
    // threshold) it is computed once — a narrow ~30-bytes/doc frame — and
    // the pipeline drops from three corpus text passes to two
    val assigned = CacheScope.cached(TextAnalysis.domainClassifierAssign(documents))
    // the SAME epoch arithmetic mix_plan_by_domain reports — one shared
    // implementation, so the shipped mix cannot drift from the audited plan
    val epochs = TextAnalysis.equalShareEpochPlan(assigned)
      .select(col("predicted_domain"), col("epochs_ppm"))
    assigned
      .join(broadcast(epochs), Seq("predicted_domain"))
      .withColumn("n_copies",
        // capped at MaxEpochs: with an uncapped equal-share plan a domain
        // holding a vanishing token share of a huge corpus gets epochs in
        // the billions and a single row's explode(sequence) overflows at
        // ~2^31 elements. Public mixing recipes cap repeats for model
        // quality anyway (repeated data degrades past a few epochs), so the
        // cap is both the scale guard and the right curation default.
        least(
          expr("epochs_ppm div 1000000") +
            when(PortableHash.hash32(concat(lit("dmix:"), col("doc_id").cast("string")))
              % 1000000L < col("epochs_ppm") % 1000000L, 1L).otherwise(0L),
          lit(MaxEpochs)))
      .where(col("n_copies") > 0)
      .select(col("predicted_domain"), col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_copies") - 1L)).as("copy_idx"))
      .groupBy(col("predicted_domain"))
      .agg(count(lit(1)).as("rows_out"),
        countDistinct(col("doc_id")).as("docs_included"),
        sum(col("n_tokens")).as("tokens_out"))
  }

  /** v6 — two-phase schedule MATERIALIZATION (closing the loop
    * [[Curation.mixAnnealSchedule]] plans): for each (phase, source) the
    * plan's token budget is realized as an actual document pick list —
    * bulk picks in hash order (an unbiased shuffle of the source), anneal
    * picks BEST-QUALITY-FIRST (q_milli descending; that ordering is the
    * point of an anneal phase) — by taking documents while the running
    * token total stays within the budget. Greedy prefix-by-cumsum is the
    * standard budgeted-selection relaxation (the exact subset-sum fill is
    * NP-hard and pointless at corpus scale); realized ≤ planned always,
    * and `fill_ppm` reports how close the prefix got (a source whose next
    * document overshoots stops early — visible, not silent).
    *
    * Scale shape: the schedule is a broadcast (2·|sources| rows); the pick
    * is one window cumsum per (phase, source) partition over a narrow
    * (doc_id, toks, q, pick) projection — no text movement; output is the
    * 2·|sources| manifest. ROWS frames are explicit: the (pick, doc_id) /
    * (q desc, pick, doc_id) orderings are total, so ROWS ≡ RANGE, but only
    * ROWS is guaranteed identical across engines when a tie ever appears.
    */
  def annealShards(documents: DataFrame): DataFrame = {
    import graft.functions.PortableHash
    import org.apache.spark.sql.expressions.Window
    val sched = Curation.mixAnnealSchedule(documents)
      .select(col("source"), col("phase"), col("phase_tokens"))
    // staged (r17, guide §2.4): the bulk and anneal windows each re-ran the
    // q_milli battery + hash over the corpus; the staged projection is 5
    // narrow columns, no text
    val docs = CacheScope.cached(documents.select(col("source"), col("doc_id"),
      org.apache.spark.sql.functions.size(split(col("text"), " "))
        .cast("long").as("toks"),
      Curation.qMilliCol.as("q_milli"),
      PortableHash.hash32(concat(lit("anneal:"), col("doc_id").cast("string")))
        .as("pick")))
    val wBulk = Window.partitionBy("source").orderBy(col("pick"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAnneal = Window.partitionBy("source")
      .orderBy(col("q_milli").desc, col("pick"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bulk = docs.withColumn("cum", sum(col("toks")).over(wBulk))
      .withColumn("phase", lit("bulk"))
    val anneal = docs.withColumn("cum", sum(col("toks")).over(wAnneal))
      .withColumn("phase", lit("anneal"))
    bulk.unionByName(anneal)
      .join(broadcast(sched), Seq("source", "phase"))
      .groupBy(col("source"), col("phase"), col("phase_tokens"))
      .agg(
        sum(when(col("cum") <= col("phase_tokens"), 1L).otherwise(0L))
          .as("n_docs"),
        sum(when(col("cum") <= col("phase_tokens"), col("toks")).otherwise(0L))
          .as("realized_tokens"))
      .select(col("source"), col("phase"),
        col("phase_tokens").as("planned_tokens"), col("n_docs"),
        col("realized_tokens"),
        when(col("phase_tokens") > 0,
          expr("(cast(realized_tokens as decimal(38,0)) * 1000000) div phase_tokens")
            .cast("long"))
          .otherwise(lit(1000000L)).as("fill_ppm"))
  }

  private def annealShardsOracle: String = {
    val hu = graft.functions.PortableHash.duckSql("'anneal:' || CAST(doc_id AS VARCHAR)")
    s"""WITH ${Curation.annealSchedCtes},
       |docs AS (
       |  SELECT source, doc_id, n_toks AS toks, q_milli, $hu AS pick
       |  FROM q),
       |bulk AS (
       |  SELECT source, doc_id, toks, 'bulk' AS phase,
       |         SUM(toks) OVER (PARTITION BY source ORDER BY pick, doc_id
       |                         ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM docs),
       |ann AS (
       |  SELECT source, doc_id, toks, 'anneal' AS phase,
       |         SUM(toks) OVER (PARTITION BY source
       |                         ORDER BY q_milli DESC, pick, doc_id
       |                         ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM docs),
       |u AS (SELECT * FROM bulk UNION ALL SELECT * FROM ann)
       |SELECT u.source, u.phase,
       |       s.phase_tokens AS planned_tokens,
       |       CAST(SUM(CASE WHEN u.cum <= s.phase_tokens THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_docs,
       |       CAST(SUM(CASE WHEN u.cum <= s.phase_tokens THEN u.toks ELSE 0 END)
       |            AS BIGINT) AS realized_tokens,
       |       CASE WHEN s.phase_tokens > 0
       |            THEN CAST((SUM(CASE WHEN u.cum <= s.phase_tokens
       |                                THEN u.toks ELSE 0 END)::HUGEINT * 1000000)
       |                 // s.phase_tokens AS BIGINT)
       |            ELSE 1000000 END AS fill_ppm
       |FROM u JOIN sched s ON s.source = u.source AND s.phase = u.phase
       |GROUP BY u.source, u.phase, s.phase_tokens""".stripMargin
  }

  private def domainMixOracle: String = {
    val hu = graft.functions.PortableHash.duckSql("'dmix:' || CAST(doc_id AS VARCHAR)")
    s"""WITH ${TextAnalysis.domAssignedCtes},
       |${TextAnalysis.domainEpochCtes},
       |cop AS (
       |  SELECT a.predicted_domain, a.doc_id, a.n_tokens,
       |         LEAST(ep.epochs_ppm // 1000000
       |           + CASE WHEN $hu % 1000000 < ep.epochs_ppm % 1000000
       |                  THEN 1 ELSE 0 END, $MaxEpochs) AS n_copies
       |  FROM dom_assigned a JOIN ep USING (predicted_domain)),
       |ex AS (
       |  SELECT predicted_domain, doc_id, n_tokens,
       |         UNNEST(range(0, n_copies)) AS copy_idx
       |  FROM cop WHERE n_copies > 0)
       |SELECT predicted_domain, COUNT(*) AS rows_out,
       |       COUNT(DISTINCT doc_id) AS docs_included,
       |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_out
       |FROM ex GROUP BY 1""".stripMargin
  }

  private def modelCurationOracle: String =
    s"""WITH ${TextAnalysis.clfScoredCtes},
       |keepers AS (
       |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
       |SELECT d.source,
       |       COUNT(*) AS doc_count,
       |       CAST(SUM(s.n_tokens) AS BIGINT) AS total_tokens,
       |       CAST(SUM(s.score_ppm) // COUNT(*) AS BIGINT) AS avg_score_ppm
       |FROM clf_scored s
       |JOIN documents d ON s.doc_id = d.doc_id
       |WHERE s.kept AND NOT s.is_holdout
       |  AND s.doc_id IN (SELECT doc_id FROM keepers)
       |GROUP BY 1""".stripMargin

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

  /** Mirrors [[pretrainShards]] stage for stage (same quality arithmetic,
    * shingle grams, portable hashes, rank and shard rules).
    */
  private def pretrainShardsOracle: String = {
    val hCap = graft.functions.PortableHash.duckSql("'cap:' || CAST(doc_id AS VARCHAR)")
    val hShuf = graft.functions.PortableHash.duckSql("'shuf:' || CAST(doc_id AS VARCHAR)")
    s"""WITH q0 AS (
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
       |keepers AS (
       |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |sh AS (
       |  SELECT doc_id,
       |         CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform(
       |           range(1, len(toks) - 1),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
       |         ELSE CAST([] AS VARCHAR[]) END AS shingles
       |  FROM q0),
       |bench AS (
       |  SELECT DISTINCT UNNEST(shingles) AS shingle FROM sh WHERE doc_id % 97 = 0),
       |contaminated AS (
       |  SELECT e.doc_id
       |  FROM (SELECT doc_id, len(shingles) AS n_sh, UNNEST(shingles) AS shingle
       |        FROM sh WHERE doc_id % 97 <> 0) e
       |  JOIN bench b ON e.shingle = b.shingle
       |  GROUP BY e.doc_id, e.n_sh
       |  HAVING CAST(COUNT(*) AS DOUBLE) / CAST(e.n_sh AS DOUBLE) >= 0.2),
       |kept AS (
       |  SELECT q.doc_id, q.n_tokens, d.source
       |  FROM quality q JOIN documents d USING (doc_id)
       |  WHERE q.quality_score >= 40.0
       |    AND q.doc_id % 97 <> 0
       |    AND q.doc_id IN (SELECT doc_id FROM keepers)
       |    AND q.doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |capped AS (
       |  SELECT doc_id, n_tokens, source FROM (
       |    SELECT doc_id, n_tokens, source,
       |           ROW_NUMBER() OVER (PARTITION BY source
       |             ORDER BY $hCap, doc_id) AS rn
       |    FROM kept) WHERE rn <= $PretrainSourceCap)
       |SELECT CAST($hShuf % $PretrainShardCount AS BIGINT) AS shard,
       |       COUNT(*) AS doc_count,
       |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
       |FROM capped GROUP BY 1""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "pipeline_anneal_shards" -> annealShardsOracle,
    "pipeline_domain_mix" -> domainMixOracle,
    "pipeline_model_curation" -> modelCurationOracle,
    "pipeline_pretrain_shards" -> pretrainShardsOracle,
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
