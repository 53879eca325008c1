package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corpus-level statistics and QA passes for training-data pipelines
  * (builder brief): the reports a curation run emits before/after the dedup
  * and filter stages — length distributions, inter-document boilerplate,
  * per-source health, embedding-norm QA.
  *
  * All shapes are one or two shuffles of small keyed aggregates; nothing
  * materializes per-pair or per-token state beyond the map-side combine.
  */
object CorpusStats {

  private def d(c: Column): Column = c.cast(DoubleType)

  /** `text_length_histogram`: per-language histogram of document token
    * counts in fixed-width buckets — the length-distribution report every
    * corpus card carries (and the input to choosing packing/truncation
    * lengths downstream).
    *
    * Scale: one shuffle on (lang, bucket) — at most |langs| × |buckets|
    * result rows regardless of corpus size; the per-doc token count is a
    * codegen'd expression inside the scan stage.
    */
  def textLengthHistogram(documents: DataFrame, bucketWidth: Int = 8): DataFrame =
    documents
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col("lang"),
        (expr(s"n_tokens div $bucketWidth") * bucketWidth).as("token_bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))

  /** `text_boilerplate_ngrams`: inter-document boilerplate detection — the
    * fraction of each document's distinct 3-gram shingles that occur in at
    * least `minDf` documents corpus-wide (headers, footers, templated spans).
    * Downstream filters drop or strip documents dominated by boilerplate.
    *
    * Shape (the inverted-index discipline of [[Dedup.dedupNgramJaccard]]):
    * explode distinct shingles once, aggregate global document frequency
    * with map-side combine, join the frequent subset back on the shingle,
    * re-aggregate per document. Work is linear in total shingles; the two
    * shingle-keyed exchanges of the same exploded frame are identical, so
    * ReuseExchange materializes the explode once. No pair of documents is
    * ever compared directly.
    */
  def textBoilerplateNgrams(documents: DataFrame, minDf: Int = 5): DataFrame = {
    val staged = Dedup.withTokens(documents, col("doc_id"))
      .select(col("doc_id"), Dedup.shinglesCol(col("toks")).as("shingles"))
    val perDoc = staged.select(col("doc_id"),
      size(col("shingles")).cast("long").as("n_shingles"))
    val inv = staged
      .select(col("doc_id"), explode_outer(col("shingles")).as("shingle"))
      .where(col("shingle").isNotNull)
    // shingles are distinct per doc, so count(*) per shingle IS document
    // frequency
    val dfreq = inv.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val boiler = inv.join(dfreq.where(col("df") >= minDf), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_boilerplate"))
    perDoc.join(boiler, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_boilerplate"), lit(0L)).as("n_boilerplate"),
        when(col("n_shingles") > 0,
          d(coalesce(col("n_boilerplate"), lit(0L))) / d(col("n_shingles")))
          .as("boilerplate_fraction"))
  }

  /** (shingle, first_doc) — the first-introducer reduction shared by
    * [[textNovelty]] and [[corpusVocabGrowth]]: for every distinct word
    * 3-gram in the corpus, the smallest doc_id that contains it.
    *
    * Plan shape: the default partial+final aggregate, KEPT on a measured
    * A/B (round 16): shingle document-frequency is Zipfian — the head
    * repeats heavily within any scan split — so the map-side combine
    * reduces ~50:1 on this corpus shape, and a shuffle-raw rewrite
    * (explicit repartition(shingle) below the aggregate, tried on the
    * "unique keys → useless partial agg" theory) measured 3.4–4×
    * MORE cpu at x100 (192–231 s vs ~56 s, control-query-normalized)
    * because it shipped every raw shingle instance through the exchange.
    * Same verdict as the prices-grain shuffle-raw A/B (docs/SCALE.md):
    * measure the reduction ratio before dropping a partial aggregate.
    *
    * The third-decade fix is LOCALITY, not plan surgery: documents are
    * range-repartitioned by doc_id before the explode, so each task's
    * partial-agg map covers a CONTIGUOUS id slice — neighboring documents
    * share vocabulary (same crawl batch here; same copy in ScaleGen's
    * replicas), so the per-task distinct-key set stays bounded and the map
    * never overflows into the external-sort path. Without it, a 128 MB
    * scan split packs ~hundreds of small files from unrelated id ranges
    * and the map spills (measured 34 GB memory-spill at x1000, the
    * 20×/decade term); the extra exchange ships raw TEXT bytes — ~10× less
    * than the shingle rows it saves from the sorter. Partition count =
    * the session's shuffle partitions (input-proportional via Tuning).
    */
  private def firstIntroducer(documents: DataFrame): DataFrame = {
    val p = documents.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    Dedup.withTokens(documents.repartitionByRange(p, col("doc_id")), col("doc_id"))
      .select(col("doc_id"), explode_outer(Dedup.shinglesCol(col("toks"))).as("shingle"))
      .where(col("shingle").isNotNull)
      .groupBy(col("shingle")).agg(min(col("doc_id")).as("first_doc"))
  }

  /** `text_novelty`: per-document novelty — what fraction of a document's
    * 3-gram shingles had never appeared in any EARLIER document (by doc_id
    * order, the ingest order of the fixture)? The corpus-diversity signal
    * selection recipes maximize: a crawl dominated by templated pages
    * scores near 0 past the first few documents, while genuinely new
    * content keeps scoring high. Exact set semantics, no sketch: a shingle
    * is novel in exactly ONE document (its [[firstIntroducer]]), so
    * n_novel sums to the corpus vocabulary size — a conservation law the
    * spec pins. novelty_ppm = n_novel·10⁶ div n_shingles (0 for
    * shingle-less docs), engine-exact.
    *
    * Scale (round 16, the x1000 fix): the r15 form joined the corpus-
    * scale inverted index back to the introducer table on `shingle` — a
    * sort-merge of TWO corpus-scaled frames whose N·log N sort term
    * measured 19.4×/decade at the third decade (docs/SCALE.md). The join
    * is ELIMINABLE: n_novel(doc) is just the introducer table grouped by
    * first_doc (a shingle is novel in exactly one document), and
    * n_shingles(doc) is `size(shingles)` — computed AT THE SCAN, no
    * explode, no shuffle. What remains is the one irreducible
    * shingle-keyed MIN aggregate plus two doc-keyed (≈1000× smaller)
    * aggregates/joins — no corpus-scale frame is ever sorted.
    */
  def textNovelty(documents: DataFrame): DataFrame = {
    val perDoc = Dedup.withTokens(documents, col("doc_id"))
      .select(col("doc_id"),
        size(Dedup.shinglesCol(col("toks"))).cast("long").as("n_shingles"))
    val novel = firstIntroducer(documents)
      .groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        when(col("n_shingles") > 0,
          expr("n_novel * 1000000 div n_shingles")).otherwise(lit(0L))
          .as("novelty_ppm"))
  }

  /** `corpus_vocab_growth`: the vocabulary-growth (Heaps'-law) curve — how
    * many NEW distinct shingles each doc_id decile of the corpus
    * introduces, with the cumulative total. The curve a data buyer reads
    * before paying for 10× more of the same crawl: if new_shingles has
    * flattened by the last decile, more of this source buys little new
    * content. Deciles are deterministic id-range buckets
    * (`least(9, doc_id·10 div (max_id+1))` with max from a one-row
    * broadcast), not ntile — the bucket of a document never moves when
    * the corpus is re-read in a different order. Output is exactly 10
    * rows (grid-joined, zero-introducing deciles kept).
    */
  def corpusVocabGrowth(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val mx = documents.agg(max(col("doc_id")).as("max_id"))
    // reduce the vocabulary-scale introducer table to per-first_doc counts
    // BEFORE the broadcast crossJoin: the 1-row max_id join plans as a
    // BroadcastNestedLoopJoin, which caps whole-stage codegen around it —
    // cheap on |docs| rows, measurable on |vocabulary| rows (~13× more)
    val perDecile = firstIntroducer(documents)
      .groupBy(col("first_doc")).agg(count(lit(1)).as("n_new"))
      .crossJoin(broadcast(mx))
      .select(least(lit(9L), expr("first_doc * 10 div (max_id + 1)")).as("decile"),
        col("n_new"))
      .groupBy(col("decile")).agg(sum(col("n_new")).as("new_shingles"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (0L to 9L).toDF("decile")
      .join(perDecile, Seq("decile"), "left")
      .select(col("decile"), coalesce(col("new_shingles"), lit(0L)).as("new_shingles"))
      .withColumn("cum_shingles", sum(col("new_shingles")).over(w))
  }

  /** `corpus_health_by_source`: the per-source corpus health report — doc
    * counts, exact-duplicate rate (via content digests, never comparing
    * bodies), language spread, mean quality (micro-quantized integer sum, so
    * the average is partition-order independent and oracle-exact), and the
    * short-document rate. This is the first dashboard a curation run feeds.
    *
    * Scale: one shuffle keyed by source; the two distinct-counts ride the
    * same aggregation (digests are 32-byte hex, not bodies). Quality reuses
    * [[TextAnalysis.textQuality]]'s exact score formula.
    */
  def corpusHealthBySource(documents: DataFrame): DataFrame = {
    val staged = Dedup.withTokens(documents,
      col("source"), col("lang"), md5(col("text")).as("h"))
    val nTok = size(col("toks")).cast("long")
    val stop = size(array_intersect(array_distinct(col("toks")),
      array(Seq("the", "a", "of", "and").map(lit): _*))).cast("long")
    val longTok = size(filter(col("toks"), t => length(t) >= 5)).cast("long")
    val score = least(lit(100.0), greatest(lit(0.0),
      d(nTok) / 2.0 + d(stop) * 10.0 + d(longTok) / d(nTok) * 30.0))
    staged
      .select(col("source"), col("lang"), col("h"),
        nTok.as("n_tokens"),
        floor(score * 1000000.0).cast("long").as("qm"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct_content"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("qm")).as("sum_quality_micros"),
        sum(when(col("n_tokens") < 30, 1L).otherwise(0L)).as("n_short"))
      .select(col("source"), col("n_docs"), col("n_distinct_content"),
        (d(col("n_docs") - col("n_distinct_content")) / d(col("n_docs")))
          .as("exact_dup_rate"),
        col("n_langs"), col("sum_quality_micros"),
        (d(col("sum_quality_micros")) / d(col("n_docs")) / lit(1000000.0))
          .as("avg_quality"),
        col("n_short"),
        (d(col("n_short")) / d(col("n_docs"))).as("short_doc_rate"))
  }

  /** `embed_norm_stats`: embedding-QA norm statistics per label — vector
    * count and min/max/sum/mean L2 norm, with norms quantized to integer
    * micros so every aggregate is partition-order independent. Degenerate
    * norms (zeros from failed encoders, explosions from un-normalized
    * batches) show up here before the vectors poison similarity search.
    *
    * The per-row norm is the native [[graft.functions.FloatNormSq]] codegen
    * expression (one primitive loop, whole-stage compatible); its strict
    * left-to-right fold makes the double bit-identical to the oracle's
    * list_reduce, and sqrt is IEEE-correctly-rounded in both engines.
    */
  def embedNormStats(embeddings: DataFrame): DataFrame = {
    val nm = floor(
      sqrt(graft.functions.VecNorm.float_norm_sq(col("embedding"))) * 1000000.0)
      .cast("long")
    embeddings
      .select(col("label").cast("long").as("label"), nm.as("norm_micros"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        min(col("norm_micros")).as("min_norm_micros"),
        max(col("norm_micros")).as("max_norm_micros"),
        sum(col("norm_micros")).as("sum_norm_micros"))
      .withColumn("avg_norm",
        d(col("sum_norm_micros")) / d(col("n_vecs")) / lit(1000000.0))
  }

  /** `embed_label_drift`: per-label centroid displacement from the global
    * centroid — the class-separation / drift audit for labeled embeddings
    * (a label whose centroid collapses onto the global mean carries no
    * signal; one that drifts between snapshots flags an encoder change).
    * Centroids use the SAME exact integer round-half arithmetic as the
    * k-means trainers ((2s+n)/(2n), sign-guarded truncation), so the whole
    * audit is integer-exact: the emitted distance is squared L2 in
    * quantization units, no float accumulation anywhere. Two bounded
    * aggregates (labels×64 and 64 rows) — nothing scales with the corpus
    * but the first pass.
    */
  def embedLabelDrift(embeddings: DataFrame): DataFrame = {
    val centroid = // exact integer round-half division, kmeans discipline
      expr("CASE WHEN 2*s + n >= 0 THEN (2*s + n) div (2*n) " +
        "ELSE -((-(2*s + n)) div (2*n)) END")
    val exploded = Dedup.quantized(embeddings)
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "v")))
    val perLabel = exploded.groupBy(col("label"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("c", centroid)
    val global = exploded.groupBy(col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("gc", centroid)
      .select(col("pos"), col("gc"))
    perLabel.join(broadcast(global), Seq("pos"))
      .groupBy(col("label"))
      .agg(
        max(col("n")).as("n_vecs"),
        sum((col("c") - col("gc")) * (col("c") - col("gc"))).as("centroid_dist2"))
  }

  /** `text_lang_confusion`: declared-vs-predicted language confusion matrix
    * — the metadata-trust audit a multilingual curation run emits before
    * deciding whether to filter on the declared `lang` tag or the
    * classifier ([[TextAnalysis.textLangid]]): the diagonal is agreement,
    * hot off-diagonal cells are either mislabeled sources or classifier
    * blind spots, and `pct_of_labeled` normalizes each row so sources of
    * different sizes compare. One corpus scan (the langid scores are a
    * pure projection), one tiny (lang × lang) aggregate, one broadcast
    * row-total join-back.
    */
  def langConfusion(documents: DataFrame): DataFrame = {
    val pred = TextAnalysis.textLangid(documents)
      .select(col("labeled_lang"), col("predicted_lang"))
    val totals = pred.groupBy(col("labeled_lang"))
      .agg(count(lit(1)).as("labeled_total"))
    pred
      .groupBy(col("labeled_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .join(broadcast(totals), Seq("labeled_lang"))
      .select(col("labeled_lang"), col("predicted_lang"),
        col("n_docs"), col("labeled_total"),
        (col("n_docs").cast(DoubleType) / col("labeled_total").cast(DoubleType)
          * 100.0).as("pct_of_labeled"))
  }

  val oracles: Map[String, String] = Map(
    "text_lang_confusion" ->
      """WITH t AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |         list_distinct(string_split(lower(text), ' ')) AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, labeled_lang,
        |    CAST(len(list_intersect(toks, ['the','a','fast','slow','small','big'])) AS BIGINT) AS score_en,
        |    CAST(len(list_intersect(toks, ['data','table','window','stream','hash'])) AS BIGINT) AS score_de,
        |    CAST(len(list_intersect(toks, ['sort','merge','join','order','group'])) AS BIGINT) AS score_es,
        |    CAST(len(list_intersect(toks, ['query','row','column','value','filter'])) AS BIGINT) AS score_fr,
        |    CAST(len(list_intersect(toks, ['spark','batch','vector','key','line'])) AS BIGINT) AS score_zh
        |  FROM t),
        |p AS (
        |  SELECT labeled_lang,
        |         CASE GREATEST(score_de * 8 + 0, score_en * 8 + 1, score_es * 8 + 2,
        |                       score_fr * 8 + 3, score_zh * 8 + 4) % 8
        |           WHEN 0 THEN 'de' WHEN 1 THEN 'en' WHEN 2 THEN 'es'
        |           WHEN 3 THEN 'fr' WHEN 4 THEN 'zh' END AS predicted_lang
        |  FROM s),
        |m AS (
        |  SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
        |  FROM p GROUP BY 1, 2),
        |tt AS (
        |  SELECT labeled_lang, COUNT(*) AS labeled_total FROM p GROUP BY 1)
        |SELECT m.labeled_lang, m.predicted_lang, m.n_docs, tt.labeled_total,
        |       CAST(m.n_docs AS DOUBLE) / CAST(tt.labeled_total AS DOUBLE) * 100.0
        |         AS pct_of_labeled
        |FROM m JOIN tt ON m.labeled_lang = tt.labeled_lang""".stripMargin,
    "embed_label_drift" ->
      """WITH q AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
        |  FROM embeddings),
        |e AS (
        |  SELECT label, d.d AS pos, q[CAST(d.d + 1 AS INT)] AS v
        |  FROM q CROSS JOIN (SELECT UNNEST(range(0, 64)) AS d) d),
        |pl AS (
        |  SELECT label, pos, SUM(v) AS s, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |plc AS (
        |  SELECT label, pos, n,
        |         CASE WHEN 2*s + n >= 0 THEN (2*s + n) // (2*n)
        |              ELSE -((-(2*s + n)) // (2*n)) END AS c
        |  FROM pl),
        |g AS (
        |  SELECT pos,
        |         CASE WHEN 2*s + n >= 0 THEN (2*s + n) // (2*n)
        |              ELSE -((-(2*s + n)) // (2*n)) END AS gc
        |  FROM (SELECT pos, SUM(v) AS s, COUNT(*) AS n FROM e GROUP BY 1))
        |SELECT plc.label, CAST(MAX(plc.n) AS BIGINT) AS n_vecs,
        |       CAST(SUM((plc.c - g.gc) * (plc.c - g.gc)) AS BIGINT) AS centroid_dist2
        |FROM plc JOIN g ON plc.pos = g.pos
        |GROUP BY 1""".stripMargin,
    "text_length_histogram" ->
      """WITH t AS (
        |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT lang, (n_tokens // 8) * 8 AS token_bucket,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |       MIN(n_tokens) AS min_tokens,
        |       MAX(n_tokens) AS max_tokens
        |FROM t GROUP BY 1, 2""".stripMargin,
    "text_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS tokens
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(
        |           range(1, greatest(len(tokens) - 1, 1)),
        |           i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingles
        |  FROM toks),
        |inv AS (SELECT doc_id, UNNEST(shingles) AS shingle FROM sh),
        |fi AS (SELECT shingle, MIN(doc_id) AS first_doc FROM inv GROUP BY 1),
        |nv AS (
        |  SELECT i.doc_id, COUNT(*) AS n_shingles,
        |         CAST(SUM(CASE WHEN f.first_doc = i.doc_id THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_novel
        |  FROM inv i JOIN fi f ON f.shingle = i.shingle
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |       COALESCE(nv.n_shingles, 0) AS n_shingles,
        |       COALESCE(nv.n_novel, 0) AS n_novel,
        |       CASE WHEN COALESCE(nv.n_shingles, 0) > 0
        |            THEN nv.n_novel * 1000000 // nv.n_shingles
        |            ELSE 0 END AS novelty_ppm
        |FROM documents d LEFT JOIN nv ON nv.doc_id = d.doc_id""".stripMargin,
    "corpus_vocab_growth" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS tokens
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(
        |           range(1, greatest(len(tokens) - 1, 1)),
        |           i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingles
        |  FROM toks),
        |inv AS (SELECT doc_id, UNNEST(shingles) AS shingle FROM sh),
        |fi AS (SELECT shingle, MIN(doc_id) AS first_doc FROM inv GROUP BY 1),
        |mx AS (SELECT MAX(doc_id) AS max_id FROM documents),
        |pd AS (
        |  SELECT LEAST(9, first_doc * 10 // (max_id + 1)) AS decile,
        |         COUNT(*) AS new_shingles
        |  FROM fi, mx GROUP BY 1),
        |grid AS (SELECT UNNEST(range(0, 10)) AS decile)
        |SELECT CAST(g.decile AS BIGINT) AS decile,
        |       CAST(COALESCE(pd.new_shingles, 0) AS BIGINT) AS new_shingles,
        |       CAST(SUM(COALESCE(pd.new_shingles, 0))
        |            OVER (ORDER BY g.decile) AS BIGINT) AS cum_shingles
        |FROM grid g LEFT JOIN pd ON pd.decile = g.decile""".stripMargin,
    "text_boilerplate_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS tokens
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(
        |           range(1, greatest(len(tokens) - 1, 1)),
        |           i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingles
        |  FROM toks),
        |inv AS (SELECT doc_id, UNNEST(shingles) AS shingle FROM sh),
        |dfreq AS (SELECT shingle, COUNT(*) AS df FROM inv GROUP BY 1),
        |pb AS (
        |  SELECT i.doc_id, COUNT(*) AS n_boil
        |  FROM inv i JOIN dfreq f ON i.shingle = f.shingle
        |  WHERE f.df >= 5 GROUP BY 1)
        |SELECT sh.doc_id,
        |       CAST(len(sh.shingles) AS BIGINT) AS n_shingles,
        |       CAST(COALESCE(pb.n_boil, 0) AS BIGINT) AS n_boilerplate,
        |       CASE WHEN len(sh.shingles) > 0
        |            THEN CAST(COALESCE(pb.n_boil, 0) AS DOUBLE)
        |                   / CAST(len(sh.shingles) AS DOUBLE)
        |       END AS boilerplate_fraction
        |FROM sh LEFT JOIN pb ON sh.doc_id = pb.doc_id""".stripMargin,
    "corpus_health_by_source" ->
      s"""WITH q AS (${TextAnalysis.qualityScoreSql}),
        |m AS (
        |  SELECT d.source, d.lang, md5(d.text) AS h,
        |         CAST(len(string_split(lower(d.text), ' ')) AS BIGINT) AS n_tokens,
        |         CAST(FLOOR(q.quality_score * 1000000.0) AS BIGINT) AS qm
        |  FROM documents d JOIN q ON d.doc_id = q.doc_id),
        |a AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         COUNT(DISTINCT h) AS n_distinct_content,
        |         COUNT(DISTINCT lang) AS n_langs,
        |         CAST(SUM(qm) AS BIGINT) AS sum_quality_micros,
        |         CAST(SUM(CASE WHEN n_tokens < 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
        |  FROM m GROUP BY 1)
        |SELECT source, n_docs, n_distinct_content,
        |       CAST(n_docs - n_distinct_content AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |         AS exact_dup_rate,
        |       n_langs, sum_quality_micros,
        |       CAST(sum_quality_micros AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1000000.0
        |         AS avg_quality,
        |       n_short,
        |       CAST(n_short AS DOUBLE) / CAST(n_docs AS DOUBLE) AS short_doc_rate
        |FROM a""".stripMargin,
    "embed_norm_stats" ->
      """WITH n AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |         CAST(FLOOR(SQRT(list_reduce(
        |           list_prepend(CAST(0 AS DOUBLE),
        |             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |           (a, b) -> a + b)) * 1000000.0) AS BIGINT) AS norm_micros
        |  FROM embeddings)
        |SELECT label, COUNT(*) AS n_vecs,
        |       MIN(norm_micros) AS min_norm_micros,
        |       MAX(norm_micros) AS max_norm_micros,
        |       CAST(SUM(norm_micros) AS BIGINT) AS sum_norm_micros,
        |       CAST(SUM(norm_micros) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0
        |         AS avg_norm
        |FROM n GROUP BY 1""".stripMargin
  )
}
