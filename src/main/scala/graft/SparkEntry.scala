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
    // §2.5 windows + marts
    "fct_stock_prices" -> ((s, d) => Windows.fctStockPrices(Tables.prices(s, d))),
    "fct_keyword_trends" -> ((s, d) => graft.models.Models.fctKeywordTrends(Tables.trends(s, d))),
    "win_lag1" -> ((s, d) => Windows.winLag1(Tables.prices(s, d))),
    // time- and volume-weighted average price; lead-gap day weights
    "win_twap" -> ((s, d) => Windows.winTwap(Tables.prices(s, d))),
    // max drawdown from the running peak, exact integer ppm
    "win_drawdown" -> ((s, d) => Windows.winDrawdown(Tables.prices(s, d))),
    // daily -> weekly OHLC resample: min_by/max_by firsts, one hash aggregate
    "agg_ohlc_weekly" -> ((s, d) => Windows.aggOhlcWeekly(Tables.prices(s, d))),
    // Cutler's 14-period RSI: integer gain/loss sums, one float at the end
    "win_rsi" -> ((s, d) => Windows.winRsi(Tables.prices(s, d))),
    // sample stddev of integer-ppm daily returns (exact-moments discipline)
    "win_volatility" -> ((s, d) => Windows.winVolatility(Tables.prices(s, d))),
    "win_lag_n" -> ((s, d) => Windows.winLagN(Tables.trends(s, d))),
    "win_rolling_avg" -> ((s, d) => Windows.winRollingAvg(Tables.prices(s, d))),
    "win_rolling_extrema" -> ((s, d) => Windows.winRollingExtrema(Tables.prices(s, d))),
    "win_recency_rank" -> ((s, d) => Windows.winRecencyRank(Tables.prices(s, d))),
    "win_centered" -> ((s, d) => Windows.winCentered(Tables.trends(s, d))),
    "win_dedup" -> ((s, d) => Windows.winDedup(Tables.events(s, d))),
    "win_percent_rank" -> ((s, d) => Windows.winPercentRank(Tables.lineitem(s, d))),
    "win_ratio_to_report" -> ((s, d) => Windows.winRatioToReport(Tables.orders(s, d))),
    "win_streak" -> ((s, d) => Windows.winStreak(Tables.events(s, d))),
    // CUSUM change-point detection per event type (window-algebra form)
    "win_cusum" -> ((s, d) => Windows.winCusum(Tables.events(s, d))),
    // two-level parallel-prefix twin (same oracle: row-identical contract)
    "win_cusum_scalable" -> ((s, d) => Windows.winCusumScalable(Tables.events(s, d))),
    "win_topk_group" -> ((s, d) => Windows.winTopkGroup(Tables.lineitem(s, d))),
    "win_topk_custom" -> ((s, d) => Windows.winTopkCustom(Tables.lineitem(s, d))),
    // §2.4 aggregations
    "agg_weekly_stats" -> ((s, d) => Aggregates.aggWeeklyStats(Tables.orders(s, d))),
    "agg_countif" -> ((s, d) => Aggregates.aggCountif(Tables.orders(s, d))),
    "agg_count_distinct_if" -> ((s, d) => Aggregates.aggCountDistinctIf(Tables.orders(s, d))),
    "agg_pct_of_count" -> ((s, d) => Aggregates.aggPctOfCount(Tables.orders(s, d))),
    "agg_stddev" -> ((s, d) => Aggregates.aggStddev(Tables.lineitem(s, d))),
    "agg_minmax_ts" -> ((s, d) => Aggregates.aggMinmaxTs(Tables.orders(s, d))),
    "agg_safe_ratio" -> ((s, d) => Aggregates.aggSafeRatio(Tables.lineitem(s, d))),
    "agg_null_aware_avg" -> ((s, d) => Aggregates.aggNullAwareAvg(Tables.events(s, d))),
    "agg_cond_max" -> ((s, d) => Aggregates.aggCondMax(Tables.events(s, d))),
    "agg_multikey" -> ((s, d) => Aggregates.aggMultikey(Tables.lineitem(s, d))),
    "agg_having" -> ((s, d) => Aggregates.aggHaving(Tables.lineitem(s, d))),
    "agg_nunique_multi" -> ((s, d) => Aggregates.aggNuniqueMulti(Tables.lineitem(s, d))),
    "agg_approx_distinct" -> ((s, d) => Aggregates.aggApproxDistinct(Tables.lineitem(s, d))),
    "agg_child_count" -> ((s, d) =>
      Aggregates.aggChildCount(Tables.orders(s, d), Tables.customer(s, d))),
    "agg_group_ordinal" -> ((s, d) => Aggregates.aggGroupOrdinal(Tables.orders(s, d))),
    "agg_pd_describe" -> ((s, d) => Aggregates.aggPdDescribe(Tables.events(s, d))),
    "agg_rollup" -> ((s, d) => Aggregates.aggRollup(Tables.lineitem(s, d))),
    "agg_dow_stats" -> ((s, d) => Aggregates.aggDowStats(Tables.orders(s, d))),
    "agg_quantiles" -> ((s, d) => Aggregates.aggQuantiles(Tables.events(s, d))),
    // per-group tail clamp at binary-exact percentiles
    "winsorize" -> ((s, d) => Aggregates.winsorize(Tables.events(s, d))),
    // pairwise segment overlap matrix with exact audience Jaccard
    "agg_audience_overlap" -> ((s, d) => Aggregates.aggAudienceOverlap(Tables.events(s, d))),
    // the sketch-algebra scale path: register tables + bucket-max union +
    // inclusion-exclusion, corpus touched once
    "agg_hll_overlap" -> ((s, d) => Aggregates.aggHllOverlap(Tables.events(s, d))),
    // KMV bottom-k sketches: direct union/Jaccard estimates, error ~1/sqrt(k)
    // even on tiny intersections where HLL inclusion-exclusion drowns
    "agg_kmv_overlap" -> ((s, d) => Aggregates.aggKmvOverlap(Tables.events(s, d))),
    "agg_quantiles_fast" -> ((s, d) => Aggregates.aggQuantilesFastAudit(Tables.events(s, d))),
    "agg_corr" -> ((s, d) => Aggregates.aggCorr(Tables.lineitem(s, d))),
    "agg_histogram" -> ((s, d) => Aggregates.aggHistogram(Tables.events(s, d))),
    "agg_mode" -> ((s, d) => Aggregates.aggMode(Tables.orders(s, d))),
    "agg_grouping_sets" -> ((s, d) => Aggregates.aggGroupingSets(Tables.lineitem(s, d))),
    "agg_bitmap_distinct" -> ((s, d) => Aggregates.aggBitmapDistinct(Tables.events(s, d))),
    "outlier_mad" -> ((s, d) => Aggregates.outlierMad(Tables.events(s, d))),
    // type-2 slowly-changing-dimension history (full rebuild + daily merge)
    "scd2_build" -> ((s, d) => Scd.scd2Build(Tables.events(s, d))),
    "scd2_merge" -> ((s, d) => Scd.scd2Merge(Tables.events(s, d))),
    // streaming twin: per-micro-batch snapshot apply, batch scd2_merge oracle
    "stream_scd2_endstate" -> ((s, d) =>
      graft.streaming.Scd2Sync.streamScd2Endstate(s, d)),
    // §2.2 staging / filters / case
    "stg_rename" -> ((s, d) => Staging.stgRename(Tables.customer(s, d))),
    "stg_unit_convert" -> ((s, d) => Staging.stgUnitConvert(Tables.events(s, d))),
    "filter_null_empty" -> ((s, d) => Staging.filterNullEmpty(Tables.customer(s, d))),
    "filter_not_true" -> ((s, d) => Staging.filterNotTrue(Tables.events(s, d))),
    "filter_in_subquery" -> ((s, d) =>
      Staging.filterInSubquery(Tables.supplier(s, d), Tables.nation(s, d))),
    "filter_sentinel" -> ((s, d) => Staging.filterSentinel(Tables.part(s, d))),
    "case_map" -> ((s, d) => Staging.caseMap(Tables.orders(s, d))),
    "case_ordinal" -> ((s, d) => Staging.caseOrdinal(Tables.orders(s, d))),
    "case_bucket" -> ((s, d) => Staging.caseBucket(Tables.orders(s, d))),
    "gender_clean" -> ((s, d) => Staging.genderClean(Tables.customer(s, d))),
    "flag_derive" -> ((s, d) => Staging.flagDerive(Tables.orders(s, d))),
    "between_ts" -> ((s, d) => Staging.betweenTs(Tables.orders(s, d))),
    // §2.8 scalar functions
    "scan_derived_cols" -> ((s, d) => Scalars.scanDerivedCols(Tables.events(s, d))),
    "scan_pushdown_param" -> ((s, d) => Scalars.scanPushdownParam(Tables.lineitem(s, d))),
    "fn_datetime" -> ((s, d) => Scalars.fnDatetime(Tables.orders(s, d))),
    "fn_string" -> ((s, d) => Scalars.fnString(Tables.customer(s, d))),
    "fn_timestamp_diff_hour" -> ((s, d) => Scalars.fnTimestampDiffHour(Tables.events(s, d))),
    // §2.6 sorts / limits
    "sort_model_output" -> ((s, d) => Sorts.sortModelOutput(Tables.orders(s, d))),
    "topk_nlargest" -> ((s, d) => Sorts.topkNlargest(Tables.lineitem(s, d))),
    "limit_param" -> ((s, d) => Sorts.limitParam(Tables.events(s, d))),
    // §2.3 joins
    "join_left_denorm" -> ((s, d) => Joins.joinLeftDenorm(
      Tables.orders(s, d), Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "join_left_agg" -> ((s, d) => Joins.joinLeftAgg(Tables.orders(s, d), Tables.lineitem(s, d))),
    "join_full_outer_expr" -> ((s, d) =>
      Joins.joinFullOuterExpr(Tables.customer(s, d), Tables.supplier(s, d))),
    "join_full_outer_composite" -> ((s, d) => Joins.joinFullOuterComposite(Tables.lineitem(s, d))),
    "join_inner_filter" -> ((s, d) => Joins.joinInnerFilter(Tables.lineitem(s, d), Tables.orders(s, d))),
    "join_semi_recent" -> ((s, d) => Joins.joinSemiRecent(Tables.lineitem(s, d), Tables.orders(s, d))),
    "join_cross_regex" -> ((s, d) => Joins.joinCrossRegex(s, Tables.part(s, d))),
    "join_fact_to_story" -> ((s, d) => Joins.joinFactToStory(Tables.lineitem(s, d), Tables.orders(s, d))),
    "join_value_backref" -> ((s, d) => Joins.joinValueBackref(Tables.supplier(s, d), Tables.nation(s, d))),
    "join_topk_back" -> ((s, d) => Joins.joinTopkBack(Tables.lineitem(s, d), Tables.part(s, d))),
    "join_asof" -> ((s, d) => Joins.joinAsof(Tables.events(s, d))),
    // forward and nearest merge_asof directions (shared one-sort plan)
    "join_asof_forward" -> ((s, d) => Joins.joinAsofForward(Tables.events(s, d))),
    "join_asof_nearest" -> ((s, d) => Joins.joinAsofNearest(Tables.events(s, d))),
    "join_asof_tolerance" -> ((s, d) => Joins.joinAsofTolerance(Tables.events(s, d))),
    // sorted-neighborhood ER: rank-range buckets, skew-proof by construction
    "join_sorted_neighborhood" -> ((s, d) => Joins.joinSortedNeighborhood(Tables.part(s, d))),
    "join_range_bucketed" -> ((s, d) => Joins.joinRangeBucketed(Tables.events(s, d))),
    "join_fuzzy_blocked" -> ((s, d) => Joins.joinFuzzyBlocked(Tables.part(s, d))),
    "join_interval_overlap" -> ((s, d) => Joins.joinIntervalOverlap(Tables.events(s, d))),
    "zorder_key" -> ((s, d) => Layout.zorderKey(Tables.lineitem(s, d))),
    "join_pd_merge" -> ((s, d) => Joins.joinPdMerge(Tables.orders(s, d), Tables.lineitem(s, d))),
    // §2.7 set ops
    "union_distinct" -> ((s, d) =>
      SetOps.unionDistinct(Tables.orders(s, d), Tables.lineitem(s, d), Tables.events(s, d))),
    "union_all_rollup" -> ((s, d) => SetOps.unionAllRollup(Tables.orders(s, d))),
    "union_participants" -> ((s, d) => SetOps.unionParticipants(Tables.lineitem(s, d))),
    "union_by_name_evolve" -> ((s, d) => SetOps.unionByNameEvolve(Tables.orders(s, d))),
    // §2.8 arrays / json
    "arr_literal_unnest" -> ((s, _) => Arrays.arrLiteralUnnest(s)),
    "struct_arr_lookup" -> ((s, d) => Arrays.structArrLookup(s, Tables.orders(s, d))),
    "arr_build_filtered" -> ((s, d) => Arrays.arrBuildFiltered(Tables.part(s, d))),
    "arr_len_default" -> ((s, d) => Arrays.arrLenDefault(Tables.part(s, d))),
    "arr_explode" -> ((s, d) => Arrays.arrExplode(Tables.part(s, d))),
    "arr_bool_rollup" -> ((s, d) => Arrays.arrBoolRollup(Tables.part(s, d))),
    "json_flatten" -> ((s, d) => Arrays.jsonFlatten(Tables.events(s, d))),
    "pd_explode" -> ((s, d) => Arrays.pdExplode(Tables.documents(s, d))),
    // §2.1 ingestion / sinks / driver-side sources
    "merge_upsert" -> ((s, d) => Merge.mergeUpsertQuery(Tables.events(s, d))),
    // CDC audit: classify every key across two snapshots (full outer + null-safe compare)
    "snapshot_diff" -> ((s, d) => Merge.snapshotDiffQuery(Tables.events(s, d))),
    // the MERGE with deletes: apply a snapshotDiff changelog back to base
    "merge_apply_cdc" -> ((s, d) => Merge.mergeApplyCdcQuery(Tables.events(s, d))),
    "schema_evolve" -> ((s, d) => Merge.schemaEvolveQuery(Tables.events(s, d))),
    "load_truncate" -> ((s, d) => Merge.loadTruncateQuery(s, Tables.events(s, d))),
    "nan_clean" -> ((s, d) => Merge.nanClean(Tables.events(s, d))),
    "synthetic_pk" -> ((s, d) => Merge.syntheticPk(Tables.events(s, d))),
    "multiidx_unstack" -> ((s, d) => Merge.multiidxUnstack(Tables.prices(s, d))),
    "serve_query" -> ((s, d) => Merge.serveQuery(s, Tables.orders(s, d))),
    "api_paginate_cursor" -> ((s, _) => graft.sources.ApiSource.cursorDf(s)),
    "api_paginate_link" -> ((s, _) => graft.sources.ApiSource.linkDf(s)),
    "api_paginate_token" -> ((s, _) => graft.sources.ApiSource.tokenDf(s)),
    "api_early_stop" -> ((s, _) => graft.sources.ApiSource.earlyStopDf(s)),
    // §2.9 reshape / serve-layer stats
    "pivot_assignee" -> ((s, d) => Reshape.pivotAssignee(Tables.orders(s, d), Tables.customer(s, d))),
    "melt_scores" -> ((s, d) => Reshape.meltScores(Tables.events(s, d))),
    "norm_first" -> ((s, d) => Reshape.normFirst(Tables.prices(s, d))),
    "period_compare" -> ((s, d) => Reshape.periodCompare(Tables.events(s, d))),
    "autocorr" -> ((s, d) => Reshape.autocorr(Tables.trends(s, d))),
    "stats_tests" -> ((s, d) => Reshape.statsTests(Tables.trends(s, d))),
    "ts_gapfill" -> ((s, d) => Reshape.tsGapfill(Tables.events(s, d))),
    // §2.11 enrichment UDFs
    "udf_sentiment" -> ((s, d) => Enrich.udfSentiment(Tables.documents(s, d))),
    "udf_clean_html" -> ((s, d) => Enrich.udfCleanHtml(Tables.part(s, d))),
    "udf_issue_type" -> ((s, d) => Enrich.udfIssueType(Tables.events(s, d))),
    // extensions: deduplication
    "dedup_exact" -> ((s, d) => Dedup.dedupExact(Tables.documents(s, d))),
    // normalization-then-hash: catches reformatted copies, still digest-only shuffle
    "dedup_exact_normalized" -> ((s, d) => Dedup.dedupExactNormalized(Tables.documents(s, d))),
    // text-format ingestion round trips (explicit schema, FAILFAST)
    "csv_ingest" -> ((s, d) => graft.sources.FileFormats.csvIngest(s, Tables.events(s, d))),
    "json_ingest" -> ((s, d) => graft.sources.FileFormats.jsonIngest(s, Tables.events(s, d))),
    "orc_ingest" -> ((s, d) => graft.sources.FileFormats.orcIngest(s, Tables.events(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.dedupNgramJaccard(Tables.documents(s, d))),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.dedupMinhashLsh(Tables.documents(s, d))),
    "dedup_minhash_eval" -> ((s, d) => Dedup.dedupMinhashEval(Tables.documents(s, d))),
    // banding tuning curve: precision/recall per (bands x rows) split
    "dedup_band_curve" -> ((s, d) => Dedup.dedupBandCurve(Tables.documents(s, d))),
    "dedup_paragraph" -> ((s, d) => Dedup.dedupParagraph(Tables.documents(s, d))),
    "dedup_containment" -> ((s, d) => Dedup.dedupContainment(Tables.documents(s, d))),
    "dedup_clusters" -> ((s, d) => Dedup.dedupClusters(Tables.documents(s, d))),
    "dedup_simhash" -> ((s, d) => Dedup.dedupSimhash(Tables.documents(s, d))),
    // plantNearDupes: the fixture has no natural >=0.95-cosine pair at any
    // sf, so each query preps deterministic planted companions (mirrored
    // in the oracle CTE) — without them all four oracles certify 0 = 0
    "dedup_embedding_cosine" -> ((s, d) =>
      Dedup.dedupEmbeddingCosine(Dedup.plantNearDupes(Tables.embeddings(s, d)))),
    "dedup_embedding_lsh" -> ((s, d) =>
      Dedup.dedupEmbeddingLsh(Dedup.plantNearDupes(Tables.embeddings(s, d)))),
    // the corpus-scale banding (4 tables x 16 sign bits): n^2*4/2^16
    // candidates vs the baseline's n^2/2^8 — see docs/SCALE.md x100 table
    "dedup_embedding_lsh_wide" -> ((s, d) =>
      Dedup.dedupEmbeddingLshWide(Dedup.plantNearDupes(Tables.embeddings(s, d)))),
    // corpus-sized banding: constant expected bucket occupancy keeps the
    // candidate volume linear in n (the fixed-16-bit form measured ~K²
    // within-bucket growth at x1000 — docs/SCALE.md)
    "dedup_embedding_lsh_auto" -> ((s, d) =>
      Dedup.dedupEmbeddingLshAuto(Dedup.plantNearDupes(Tables.embeddings(s, d)))),
    // embedding-space benchmark decontamination (asymmetric banded probe;
    // the planted companions serve as the benchmark set — non-vacuous)
    "decontaminate_semantic" -> ((s, d) =>
      Dedup.decontaminateSemantic(Tables.embeddings(s, d))),
    // extensions: similarity search
    "sim_search_bruteforce" -> ((s, d) => Similarity.simSearchBruteforce(Tables.embeddings(s, d))),
    "sim_search_lsh" -> ((s, d) => Similarity.simSearchLsh(Tables.embeddings(s, d))),
    "sim_search_ivf" -> ((s, d) => Similarity.simSearchIvf(Tables.embeddings(s, d))),
    "knn_graph" -> ((s, d) => Similarity.knnGraph(Tables.embeddings(s, d))),
    // corpus-sized √N-kmeans blocking (Θ(N^1.5) — the production path; the
    // plain forms' fixed multiprobe blocking is Θ(N²/2⁸), docs/SCALE.md)
    "knn_graph_auto" -> ((s, d) => Similarity.knnGraphAuto(Tables.embeddings(s, d))),
    "mine_hard_negatives_auto" -> ((s, d) =>
      Similarity.mineHardNegativesAuto(Tables.embeddings(s, d))),
    "graph_centrality_auto" -> ((s, d) =>
      Similarity.graphCentralityAuto(Tables.embeddings(s, d))),
    // fixed-point PageRank over the kNN graph (curation hub signal)
    "graph_centrality" -> ((s, d) => Similarity.graphCentrality(Tables.embeddings(s, d))),
    "embed_pq" -> ((s, d) => Similarity.embedPq(Tables.embeddings(s, d))),
    "sim_search_pq" -> ((s, d) => Similarity.simSearchPq(Tables.embeddings(s, d))),
    "sim_search_ivfpq" -> ((s, d) => Similarity.simSearchIvfPq(Tables.embeddings(s, d))),
    "sim_search_recall_eval" -> ((s, d) =>
      Similarity.simSearchRecallEval(Tables.embeddings(s, d))),
    "sim_search_nprobe_curve" -> ((s, d) =>
      Similarity.simSearchNprobeCurve(Tables.embeddings(s, d))),
    "sim_search_mrr_eval" -> ((s, d) =>
      Similarity.simSearchMrrEval(Tables.embeddings(s, d))),
    "embed_kmeans" -> ((s, d) => Similarity.embedKmeans(Tables.embeddings(s, d))),
    // SemDeDup-style cluster-representative selection (one keeper/cluster)
    "dedup_semantic" -> ((s, d) => Similarity.dedupSemantic(Tables.embeddings(s, d))),
    // contrastive-training prep: nearest different-label neighbors
    "mine_hard_negatives" -> ((s, d) => Similarity.mineHardNegatives(Tables.embeddings(s, d))),
    // extensions: text analysis
    "text_langid" -> ((s, d) => TextAnalysis.textLangid(Tables.documents(s, d))),
    "text_quality" -> ((s, d) => TextAnalysis.textQuality(Tables.documents(s, d))),
    // character-diversity Gini (transcendental-free entropy stand-in)
    "text_char_gini" -> ((s, d) => TextAnalysis.textCharGini(Tables.documents(s, d))),
    "text_token_count" -> ((s, d) => TextAnalysis.textTokenCount(Tables.documents(s, d))),
    "text_fingerprint" -> ((s, d) => TextAnalysis.textFingerprint(Tables.documents(s, d))),
    "text_repetition" -> ((s, d) => TextAnalysis.textRepetition(Tables.documents(s, d))),
    "text_bigram_lm" -> ((s, d) => TextAnalysis.textBigramLm(Tables.documents(s, d))),
    // CCNet-style head/middle/tail LM-quality tiers; thresholds from the
    // model-sized (lang, score_ppm) distribution, not a per-lang rank window
    "text_perplexity_buckets" -> ((s, d) =>
      TextAnalysis.textPerplexityBuckets(Tables.documents(s, d))),
    "text_tfidf_terms" -> ((s, d) => TextAnalysis.textTfidfTerms(Tables.documents(s, d))),
    // extensions: multimodal columns
    "mm_metadata" -> ((s, d) => Multimodal.mmMetadata(Tables.documents(s, d))),
    "mm_decode_stub" -> ((s, d) => Multimodal.mmDecodeStub(Tables.documents(s, d))),
    "mm_frame_sample" -> ((s, d) => Multimodal.mmFrameSample(Tables.documents(s, d))),
    // the typed codec-boundary twin of mm_decode_stub, same oracle
    "mm_decode_batched" -> ((s, d) => Multimodal.mmDecodeBatched(Tables.documents(s, d))),
    "mm_content_dedup" -> ((s, d) => Multimodal.mmContentDedup(Tables.documents(s, d))),
    // aspect-ratio bucketing + per-bucket batch assignment (vision training)
    "mm_aspect_bucket" -> ((s, d) => Multimodal.mmAspectBucket(Tables.documents(s, d))),
    // LAION-style (media, caption) alignment filter with a planted
    // aligned/misaligned pair table (non-vacuous discrimination oracle)
    "mm_text_align" -> ((s, d) => Multimodal.mmTextAlign(Tables.documents(s, d))),
    // extensions: composed curation pipeline
    "pipeline_training_data" -> ((s, d) => Pipeline.trainingDataCuration(Tables.documents(s, d))),
    "pipeline_curation_v2" -> ((s, d) => Pipeline.trainingDataCurationV2(Tables.documents(s, d))),
    // v3: quality -> dedup -> decontamination -> per-source cap -> shard manifest
    "pipeline_pretrain_shards" -> ((s, d) => Pipeline.pretrainShards(Tables.documents(s, d))),
    // model-gated curation (classifier gate -> exact dedup -> source manifest)
    "pipeline_model_curation" -> ((s, d) => Pipeline.modelCuration(Tables.documents(s, d))),
    "pipeline_domain_mix" -> ((s, d) => Pipeline.domainMix(Tables.documents(s, d))),
    // two-phase bulk/anneal schedule realized as budgeted pick manifests
    "pipeline_anneal_shards" -> ((s, d) => Pipeline.annealShards(Tables.documents(s, d))),
    // round-3 curation surface: redaction, contamination, sampling, packing
    "pii_redact" -> ((s, d) => Curation.piiRedact(Tables.documents(s, d))),
    "contamination_check" -> ((s, d) => Curation.contaminationCheck(Tables.documents(s, d))),
    "contamination_bloom" -> ((s, d) => Curation.contaminationBloom(Tables.documents(s, d))),
    "dedup_substring" -> ((s, d) => Dedup.dedupSubstring(Tables.documents(s, d))),
    "dedup_incremental" -> ((s, d) => Dedup.dedupIncremental(Tables.documents(s, d))),
    "sample_weighted_mix" -> ((s, d) => Curation.sampleWeightedMix(Tables.documents(s, d))),
    "sample_stratified" -> ((s, d) => Curation.sampleStratified(Tables.documents(s, d))),
    "sample_bottomk" -> ((s, d) => Curation.sampleBottomK(Tables.documents(s, d))),
    "sample_reservoir_weighted" -> ((s, d) =>
      Curation.sampleReservoirWeighted(Tables.documents(s, d))),
    "shard_shuffle" -> ((s, d) => Curation.shardShuffle(Tables.documents(s, d))),
    "split_train_test" -> ((s, d) => Curation.splitTrainTest(Tables.documents(s, d))),
    "split_leakage_safe" -> ((s, d) => Curation.splitLeakageSafe(Tables.documents(s, d))),
    "lang_balance_sample" -> ((s, d) => Curation.langBalanceSample(Tables.documents(s, d))),
    "cap_per_source" -> ((s, d) => Curation.capPerSource(Tables.documents(s, d))),
    "quality_decile_filter" -> ((s, d) =>
      TextAnalysis.qualityDecileFilter(Tables.documents(s, d))),
    "dedup_keep_best" -> ((s, d) => Dedup.dedupKeepBest(Tables.documents(s, d))),
    "text_top_terms" -> ((s, d) => TextAnalysis.textTopTerms(Tables.documents(s, d))),
    // first k BPE merge rules learned over the corpus (tokenizer training)
    "bpe_train_merges" -> ((s, d) => TextAnalysis.bpeTrainMerges(Tables.documents(s, d))),
    "bpe_train_batched" -> ((s, d) => TextAnalysis.bpeTrainBatched(Tables.documents(s, d))),
    "bpe_vocab_coverage" -> ((s, d) =>
      TextAnalysis.bpeVocabCoverage(Tables.documents(s, d))),
    "bpe_fertility_by_lang" -> ((s, d) =>
      TextAnalysis.bpeFertilityByLang(Tables.documents(s, d))),
    "bpe_encode" -> ((s, d) => TextAnalysis.bpeEncode(Tables.documents(s, d))),
    "bpe_token_count" -> ((s, d) => TextAnalysis.bpeTokenCount(Tables.documents(s, d))),
    // per-source percentile calibration of the quality score
    "quality_calibrate" -> ((s, d) => TextAnalysis.qualityCalibrate(Tables.documents(s, d))),
    // model-based curation: hashed-feature linear classifier (fastText/CCNet
    // shape) — counting train on the 80% split, broadcast-model map-only score
    "quality_classifier_train" -> ((s, d) =>
      TextAnalysis.qualityClassifierTrain(Tables.documents(s, d))),
    "quality_classifier_score" -> ((s, d) =>
      TextAnalysis.qualityClassifierScore(Tables.documents(s, d))),
    "quality_classifier_eval" -> ((s, d) =>
      TextAnalysis.qualityClassifierEval(Tables.documents(s, d))),
    "quality_classifier_calibration" -> ((s, d) =>
      TextAnalysis.qualityClassifierCalibration(Tables.documents(s, d))),
    "quality_model_drift" -> ((s, d) =>
      TextAnalysis.qualityModelDrift(Tables.documents(s, d))),
    // per-source distribution-drift monitors (exact-integer KS / χ² / TV)
    "drift_ks" -> ((s, d) => Drift.driftKs(Tables.documents(s, d))),
    "drift_chi2" -> ((s, d) => Drift.driftChi2(Tables.documents(s, d))),
    "drift_tv" -> ((s, d) => Drift.driftTv(Tables.documents(s, d))),
    // learned multi-class domain classifier (mix-planner input) + its eval
    "domain_classifier_assign" -> ((s, d) =>
      TextAnalysis.domainClassifierAssign(Tables.documents(s, d))),
    "domain_classifier_confusion" -> ((s, d) =>
      TextAnalysis.domainClassifierConfusion(Tables.documents(s, d))),
    // per-class precision/recall/F1 (exact rational F1 identity)
    "domain_classifier_prf" -> ((s, d) =>
      TextAnalysis.domainClassifierPrf(Tables.documents(s, d))),
    // Cohen's kappa: learned quality gate vs the C4/Gopher rules gate
    "quality_kappa" -> ((s, d) =>
      TextAnalysis.qualityKappa(Tables.documents(s, d))),
    "mix_plan_by_domain" -> ((s, d) =>
      TextAnalysis.mixPlanByDomain(Tables.documents(s, d))),
    "c4_gopher_filters" -> ((s, d) =>
      TextAnalysis.c4GopherFilters(Tables.documents(s, d))),
    "text_top_terms_sketch" -> ((s, d) =>
      TextAnalysis.textTopTermsSketch(Tables.documents(s, d))),
    // corpus-level stats / QA reports
    "text_length_histogram" -> ((s, d) => CorpusStats.textLengthHistogram(Tables.documents(s, d))),
    "text_boilerplate_ngrams" -> ((s, d) => CorpusStats.textBoilerplateNgrams(Tables.documents(s, d))),
    // first-introducer shingle analysis: per-doc novelty + Heaps growth curve
    "text_novelty" -> ((s, d) => CorpusStats.textNovelty(Tables.documents(s, d))),
    "corpus_vocab_growth" -> ((s, d) => CorpusStats.corpusVocabGrowth(Tables.documents(s, d))),
    "corpus_health_by_source" -> ((s, d) => CorpusStats.corpusHealthBySource(Tables.documents(s, d))),
    "embed_norm_stats" -> ((s, d) => CorpusStats.embedNormStats(Tables.embeddings(s, d))),
    // per-label centroid displacement from the global centroid (drift audit)
    "embed_label_drift" -> ((s, d) => CorpusStats.embedLabelDrift(Tables.embeddings(s, d))),
    "embed_quantize" -> ((s, d) => Curation.embedQuantize(Tables.embeddings(s, d))),
    "token_pack" -> ((s, d) => Curation.tokenPack(Tables.documents(s, d))),
    // overlapping context-window chunking (retrieval/embedding prep)
    "chunk_fixed_tokens" -> ((s, d) => Curation.chunkFixedTokens(Tables.documents(s, d))),
    // equal-share training-mixture plan (epochs per source, exact ppm)
    "mix_plan" -> ((s, d) => Curation.mixPlan(Tables.documents(s, d))),
    "mix_plan_temperature" -> ((s, d) => Curation.mixPlanTemperature(Tables.documents(s, d))),
    // two-phase bulk→anneal schedule + quality-ordered curriculum layout
    "mix_anneal_schedule" -> ((s, d) => Curation.mixAnnealSchedule(Tables.documents(s, d))),
    "curriculum_order" -> ((s, d) => Curation.curriculumOrder(Tables.documents(s, d))),
    // DSIR importance resampling (hashed-bigram likelihood ratio)
    "dsir_train" -> ((s, d) => Curation.dsirTrain(Tables.documents(s, d))),
    "dsir_score" -> ((s, d) => Curation.dsirScore(Tables.documents(s, d))),
    "dsir_resample" -> ((s, d) => Curation.dsirResample(Tables.documents(s, d))),
    "sessionize_batch" -> ((s, d) => graft.streaming.Sessionize.sessionizeBatch(Tables.events(s, d))),
    // product-analytics rollups: strictly-ordered funnel + cohort retention
    "funnel_steps" -> ((s, d) => Funnel.funnelSteps(Tables.events(s, d))),
    "retention_cohorts" -> ((s, d) => Funnel.retentionCohorts(Tables.events(s, d))),
    // first-touch attribution: bucket-decomposed lookback join, tie-broken min
    "attribution_first_touch" -> ((s, d) => Funnel.attributionFirstTouch(Tables.events(s, d))),
    // time-bounded funnel: each step must land inside the conversion window
    "funnel_windowed" -> ((s, d) => Funnel.funnelStepsWindowed(Tables.events(s, d))),
    // rolling retention: counted at k if active at k or ANY later week
    "retention_rolling" -> ((s, d) => Funnel.retentionRolling(Tables.events(s, d))),
    // declared-vs-predicted language confusion matrix (metadata-trust audit)
    "text_lang_confusion" -> ((s, d) => CorpusStats.langConfusion(Tables.documents(s, d))),
    // near-dup provenance matrix: which sources duplicate which
    "dedup_cross_source" -> ((s, d) => Dedup.dedupCrossSource(Tables.documents(s, d))),
    // §2.10 stateful-streaming twin: flatMapGroupsWithState sessionizer driven
    // end-to-end, checked against the SAME batch oracle SQL
    "stream_sessionize_endstate" -> ((s, d) =>
      graft.streaming.Sessionize.streamSessionizeEndstate(s, d)),
    // watermarked tumbling-window agg driven end-to-end, batch GROUP BY oracle
    "stream_daily_counts_endstate" -> ((s, d) =>
      graft.streaming.Sessionize.streamDailyCountsEndstate(s, d)),
    // watermark late-data DROP contract: late probes must be discarded, so
    // the same batch oracle (which never saw them) is the assertion
    "stream_late_data_endstate" -> ((s, d) =>
      graft.streaming.Sessionize.streamLateDataEndstate(s, d)),
    // ingestion-time exact dedup: dropDuplicatesWithinWatermark across
    // micro-batch replays, batch DISTINCT oracle
    "stream_dedup_endstate" -> ((s, d) =>
      graft.streaming.StreamDedup.streamDedupEndstate(s, d)),
    // stream-static enrichment join (stateless), batch-join oracle
    "stream_enrich_endstate" -> ((s, d) =>
      graft.streaming.StreamEnrich.streamEnrichEndstate(s, d)),
    // model-gated ingest filter (frozen classifier, stateless), batch oracle
    "stream_model_filter_endstate" -> ((s, d) =>
      graft.streaming.StreamModelFilter.streamModelFilterEndstate(s, d)),
    // temporal drift: batch-over-batch TV via watermarked day histograms
    "stream_drift_endstate" -> ((s, d) =>
      graft.streaming.StreamDrift.streamDriftEndstate(s, d)),
    // daily-grain CUSUM change points over watermarked day aggregates
    "stream_cusum_endstate" -> ((s, d) =>
      graft.streaming.StreamCusum.streamCusumEndstate(s, d)),
    // round-2 mart compositions (VERDICT.md Missing #1)
    "fct_sales_by_county" -> ((s, d) => graft.models.Marts.fctSalesByCounty(
      graft.models.Marts.sales(Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.part(s, d), Tables.supplier(s, d)))),
    "fct_top_vendors" -> ((s, d) => graft.models.Marts.fctTopVendors(
      graft.models.Marts.sales(Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.part(s, d), Tables.supplier(s, d)))),
    "dim_users" -> ((s, d) => graft.models.Marts.dimUsers(Tables.customer(s, d), Tables.supplier(s, d))),
    "fct_sector_performance" -> ((s, d) => graft.models.Marts.fctSectorPerformance(
      Tables.prices(s, d), Tables.supplier(s, d), Tables.nation(s, d))),
    // round-2 full-width regex-battery marts (VERDICT.md Missing #2)
    "int_fda_reactions" -> ((s, d) => graft.models.TextMarts.intFdaReactions(
      graft.models.TextMarts.fdaEvents(Tables.events(s, d)))),
    "fct_fda_events_by_reaction" -> ((s, d) => graft.models.TextMarts.fctFdaEventsByReaction(
      graft.models.TextMarts.fdaEvents(Tables.events(s, d)))),
    "int_hn_keywords" -> ((s, d) => graft.models.TextMarts.intHnKeywords(Tables.documents(s, d))),
    "fct_hn_keyword_sentiment" -> ((s, d) =>
      graft.models.TextMarts.fctHnKeywordSentiment(Tables.documents(s, d))),
    // the nested-comment recursion the reference punts (hacker_news.py:235-236),
    // as log-round pointer doubling vs a recursive-CTE oracle
    "hn_thread_resolve" -> ((s, d) =>
      graft.models.TextMarts.hnThreadResolve(Tables.documents(s, d))),
    // per-thread rollup (size / max depth / direct-reply fan-out) over the
    // resolved forest — analytics the top-level-only reference source can't do
    "hn_thread_stats" -> ((s, d) =>
      graft.models.TextMarts.hnThreadStats(Tables.documents(s, d))),
    // §2.10 streaming end-state, oracle-checked against the batch MERGE
    // §2.10 lookback-window mart refresh (stale mart + trailing-window splice)
    "incremental_refresh_window" -> ((s, d) =>
      IncrementalMart.incrementalRefreshWindow(Tables.orders(s, d))),
    // day-partitioned backfill re-runs (reference backfill_hn_comments.py)
    "backfill_days" -> ((s, d) =>
      IncrementalMart.backfillDaysQuery(Tables.orders(s, d))),
    // explicit two-phase salting for pathological hot keys
    "skew_salted_sum" -> ((s, d) => Skew.skewSaltedSum(Tables.lineitem(s, d))),
    "stream_upsert_endstate" -> ((s, d) =>
      graft.streaming.IncrementalSync.streamUpsertEndstate(s, d)),
    // the same sync through the object-store manifest commit (same oracle)
    "stream_upsert_manifest_endstate" -> ((s, d) =>
      graft.streaming.IncrementalSync.streamUpsertManifestEndstate(s, d)),
    // the sync under a 90%-one-key re-delivery storm: salted two-phase
    // keep-latest (skew-safe argmax) vs the per-key-window oracle
    "stream_upsert_skew_endstate" -> ((s, d) =>
      graft.streaming.IncrementalSync.streamUpsertSkewEndstate(s, d)),
    // stream-stream interval join (watermarked state both sides)
    "stream_stream_join_endstate" -> ((s, d) =>
      graft.streaming.StreamJoin.streamStreamJoinEndstate(s, d)),
    // outer variant: unmatched rows flush on watermark (sentinel-driven)
    "stream_outer_join_endstate" -> ((s, d) =>
      graft.streaming.StreamJoin.streamOuterJoinEndstate(s, d)),
    // remaining Models marts on deterministic adapters (all 22 now registered)
    "fct_issues" -> ((s, d) =>
      graft.models.ModelAdapters.fctIssues(s, Tables.orders(s, d), Tables.customer(s, d))),
    "fct_pull_requests" -> ((s, d) =>
      graft.models.ModelAdapters.fctPullRequests(Tables.orders(s, d), Tables.lineitem(s, d))),
    "fct_reviewer_activity" -> ((s, d) =>
      graft.models.ModelAdapters.fctReviewerActivity(Tables.orders(s, d), Tables.lineitem(s, d))),
    "fct_oura_daily" -> ((s, d) =>
      graft.models.ModelAdapters.fctOuraDaily(Tables.events(s, d))),
    // the 9 previously shape-proxied reference marts, full-fidelity (r17)
    "fct_fda_events_by_gender" -> ((s, d) =>
      graft.models.RefMarts.fctFdaEventsByGender(Tables.events(s, d))),
    "fct_fda_events_by_product" -> ((s, d) =>
      graft.models.RefMarts.fctFdaEventsByProduct(Tables.events(s, d))),
    "fct_fda_events_monthly" -> ((s, d) =>
      graft.models.RefMarts.fctFdaEventsMonthly(Tables.events(s, d))),
    "fct_fda_recalls_by_state" -> ((s, d) =>
      graft.models.RefMarts.fctFdaRecallsByState(Tables.orders(s, d))),
    "fct_fda_recalls_by_topic" -> ((s, d) =>
      graft.models.RefMarts.fctFdaRecallsByTopic(Tables.orders(s, d))),
    "fct_hn_weekly_stats" -> ((s, d) =>
      graft.models.RefMarts.fctHnWeeklyStats(Tables.documents(s, d))),
    "fct_hn_domain_stats" -> ((s, d) =>
      graft.models.RefMarts.fctHnDomainStats(Tables.documents(s, d))),
    "fct_hn_keyword_trends" -> ((s, d) =>
      graft.models.RefMarts.fctHnKeywordTrends(Tables.documents(s, d))),
    "fct_sales_monthly" -> ((s, d) => graft.models.RefMarts.fctSalesMonthly(
      graft.models.Marts.sales(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.nation(s, d), Tables.part(s, d),
        Tables.supplier(s, d)))),
    // Scale-path variants: the xxhash64 `fastHash` switch is the production
    // hash for the sketch operators (the md5-based PortableHash exists only
    // for cross-engine oracle parity and costs ~4x). xxhash64 itself has no
    // DuckDB twin, so each fast twin registers as its AUDITED form — the
    // full xxhash pipeline runs, and the query emits the hash-independent
    // contract the oracle CAN check exactly: seeded-recall floors for the
    // dedup twins (identical docs must always be recovered, any hash), and
    // exact-reference tolerance/rank flags for the sketch aggregates. The
    // portable-hash forms above remain the value-level oracle proof of the
    // identical algorithm shape.
    "agg_approx_distinct_fast" -> ((s, d) =>
      Aggregates.aggApproxDistinctFastAudit(Tables.lineitem(s, d))),
    "dedup_minhash_lsh_fast" -> ((s, d) =>
      Dedup.dedupMinhashLshFastAudit(Tables.documents(s, d))),
    "dedup_simhash_fast" -> ((s, d) =>
      Dedup.dedupSimhashFastAudit(Tables.documents(s, d))),
    "dedup_paragraph_fast" -> ((s, d) =>
      Dedup.dedupParagraphFastAudit(Tables.documents(s, d))),
    // the reference's `dbt build` lifecycle as ONE program (SURVEY §3.2):
    // every mart/intermediate model from raw inputs in one plan, reduced to
    // a per-model manifest row (Dag scaladoc)
    "dag_full_build" -> ((s, d) => graft.models.Dag.fullBuild(s, d, queries))
  )

  def oracleSql: Map[String, String] = {
    val base = baseOracleSql
    base + ("dag_full_build" -> graft.models.Dag.oracle(base))
  }

  private def baseOracleSql: Map[String, String] =
    Oracles.all ++ Aggregates.oracles ++ Staging.oracles ++ Scalars.oracles ++
      Sorts.oracles ++ Joins.oracles ++ SetOps.oracles ++ Arrays.oracles ++
      Layout.oracles ++
      Merge.oracles ++ graft.sources.ApiSource.oracles ++
      graft.sources.FileFormats.oracles ++ Reshape.oracles ++
      Enrich.oracles ++ Dedup.oracles ++ Similarity.oracles ++ Drift.oracles ++
      TextAnalysis.oracles ++ CorpusStats.oracles ++ Multimodal.oracles ++ Pipeline.oracles ++
      Curation.oracles ++ IncrementalMart.oracles ++ Skew.oracles ++ Scd.oracles ++ Funnel.oracles ++
      graft.models.Marts.oracles ++ graft.models.TextMarts.oracles ++
      graft.models.RefMarts.oracles ++
      graft.streaming.IncrementalSync.oracles ++ graft.streaming.Sessionize.oracles ++
      graft.streaming.StreamDedup.oracles ++ graft.streaming.Scd2Sync.oracles ++
      graft.streaming.StreamEnrich.oracles ++ graft.streaming.StreamJoin.oracles ++
      graft.streaming.StreamModelFilter.oracles ++
      graft.streaming.StreamDrift.oracles ++
      graft.streaming.StreamCusum.oracles ++
      graft.models.ModelAdapters.oracles
}
