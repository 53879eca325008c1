package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.LongDot.long_dot
import graft.functions.LongEqCount.long_eq_count

/** Large-scale deduplication operators — the training-data-pipeline extension
  * surface (builder brief; BASELINE.json north_star). All variants are
  * partition-parallel with no driver-side collection:
  *
  *  - exact: content-hash groupBy — one shuffle on a 128-bit digest, never on
  *    the full text (at 100 TB the shuffle carries 32-byte keys, not bodies).
  *  - MinHash+LSH: shingle → k=16 minhash sigs → 4 bands → candidate pairs
  *    join on (band, band_hash) — quadratic only within colliding buckets.
  *  - SimHash: 16-bit signature, nibble-banded candidate join, hamming ≤ 3.
  *  - n-gram Jaccard: exact 3-gram shingle Jaccard within (lang, length)
  *    blocks — the verification baseline the sketches approximate.
  *  - embedding cosine: integer-quantized (1e4) vectors → exact dot via the
  *    native [[graft.functions.LongDot]] codegen expression.
  */
object Dedup {

  /** Raw word token sequence per doc (shared prep). Shingles MUST come from
    * the raw sequence, not a distinct set — n-gram semantics, and
    * order-stability across engines (DuckDB list_distinct reorders).
    */
  private[operators] def tokensCol: Column = split(lower(col("text")), " ")

  /** Stage tokens through their OWN projection before any shingle HOF
    * references them: interpreted higher-order functions perform no common-
    * subexpression elimination, so an inline `split(lower(text))` referenced
    * five times inside [[shinglesCol]] re-tokenizes the document five times
    * per row (measured 11x slower at sf0.1). CollapseProject will not merge
    * the projections back — the alias is referenced multiple times and the
    * expression is non-cheap.
    */
  private[operators] def withTokens(documents: DataFrame, keep: Column*): DataFrame =
    documents.select(keep :+ tokensCol.as("toks"): _*)

  /** Word 3-gram shingle set via the native [[graft.functions.WordShingles]]
    * expression — one codegen loop per document. (Historically a nested
    * zip_with-of-slices HOF: CodegenFallback, two boxed lambdas and three
    * array allocations per row; WordShinglesSpec pins the exact-parity
    * semantics and PlanAuditSpec guards against fallback regressions.)
    *
    * Exploded via explode_outer + IsNotNull everywhere: a plain explode makes
    * InferFiltersFromGenerate synthesize `size(shingles) > 0`, which pushes
    * to the scan and re-evaluates the whole shingle expression a second time
    * per row; the outer variant is exempt, and shingle elements are never
    * NULL, so dropping NULL rows post-Generate is exactly inner-explode
    * semantics.
    */
  private[operators] def shinglesCol(tokens: Column): Column =
    // coalesce keeps the historical wrapper semantics: NULL tokens → empty
    // shingle set (the expression itself null-propagates like any unary)
    coalesce(graft.functions.WordShingles.word_shingles(tokens, 3),
      array().cast("array<string>"))

  /** `dedup_exact`: group on md5(text) — keep lowest doc_id per digest. */
  def dedupExact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(
        min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("dup_count"))

  /** `dedup_exact_normalized`: exact dedup AFTER canonical text
    * normalization (lowercase, punctuation → space, whitespace collapsed,
    * trimmed) — catches the trivially-reformatted copies raw-byte
    * [[dedupExact]] misses (case changes, punctuation variants, wrapped
    * whitespace) while staying a pure hash-groupBy: the normalization is a
    * codegen'd projection, the shuffle still carries only digests. The
    * first rung of the dedup ladder between raw-exact and minhash.
    */
  def dedupExactNormalized(documents: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    documents
      .groupBy(md5(norm).as("content_hash"))
      .agg(
        min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("dup_count"))
  }

  /** `dedup_ngram_jaccard`: exact 3-gram Jaccard ≥ 0.3 between doc pairs,
    * blocked on (lang, n_chars div 100).
    *
    * Computed via an inverted shingle index: explode shingles, self-join on
    * (block, shingle) to count intersections, recover the union from set
    * sizes (|A∪B| = |A|+|B|−|A∩B|). Work is proportional to Σ freq² per
    * shingle — near-linear for rare shingles — instead of the quadratic
    * all-pairs array scan; pairs sharing zero shingles (jaccard 0) never
    * materialize. This is the shape that survives 100 TB: one shuffle on the
    * shingle, one on the pair key.
    */
  def dedupNgramJaccard(documents: DataFrame): DataFrame = {
    val docs = withTokens(documents,
      col("doc_id"), col("lang"), expr("n_chars div 100").as("len_bucket"))
      .select(col("doc_id"), col("lang"), col("len_bucket"),
        shinglesCol(col("toks")).as("shingles"))
    val sizes = docs.select(col("doc_id"), size(col("shingles")).cast("long").as("sz"))
    // scope-cached: both self-join sides read the exploded index (and the
    // shingle construction is the dominant scan work)
    val inv = CacheScope.cached(docs.select(col("lang"), col("len_bucket"), col("doc_id"),
      explode_outer(col("shingles")).as("shingle"))
      .where(col("shingle").isNotNull))
    val a = inv.select(col("lang"), col("len_bucket"), col("shingle"),
      col("doc_id").as("doc_id_1"))
    val b = inv.select(col("lang"), col("len_bucket"), col("shingle"),
      col("doc_id").as("doc_id_2"))
    val inter = a.join(b, Seq("lang", "len_bucket", "shingle"))
      .where(col("doc_id_1") < col("doc_id_2"))
      .groupBy(col("lang"), col("doc_id_1"), col("doc_id_2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_id_1"), col("sz").as("sz1")), Seq("doc_id_1"))
      .join(sizes.select(col("doc_id").as("doc_id_2"), col("sz").as("sz2")), Seq("doc_id_2"))
      .withColumn("uni", col("sz1") + col("sz2") - col("inter"))
      .withColumn("jaccard", col("inter").cast(DoubleType) / col("uni").cast(DoubleType))
      .where(col("jaccard") >= 0.3)
      .select(col("doc_id_1"), col("doc_id_2"), col("lang"), col("jaccard"))
  }

  /** `dedup_containment`: directed near-dup containment — |A∩B| / |A| over
    * 3-gram shingle sets, the ASYMMETRIC cousin of [[dedupNgramJaccard]].
    * Jaccard misses the quote/subset case by construction (a 50-shingle doc
    * embedded in a 5000-shingle doc has J ≈ 0.01 but containment 1.0);
    * containment is how excerpt-of, quote-of, and version-of relations are
    * actually found in corpus curation. Deliberately NOT length-blocked —
    * the interesting pairs have wildly different lengths — so the inverted
    * index is kept quadratic-safe by the df cap instead: shingles present
    * in more than `maxDf` same-language docs carry no containment signal
    * (boilerplate) and would inflate the index join as Σ df²; they are
    * dropped from BOTH the intersection and the denominator (containment
    * over the informative-shingle subset — mirrored exactly in the oracle,
    * and the same discipline as text_boilerplate_ngrams). Work is
    * O(Σ df² over rare shingles), one term-keyed shuffle.
    */
  def dedupContainment(
      documents: DataFrame, threshold: Double = 0.5, maxDf: Int = 50): DataFrame = {
    val docs = withTokens(documents, col("doc_id"), col("lang"))
      .select(col("doc_id"), col("lang"), shinglesCol(col("toks")).as("shingles"))
    // scope-cached: the exploded inventory feeds the df census AND the
    // filtered index; the filtered index feeds sizes and BOTH self-join
    // sides — uncached, the tokenize+shingle explode ran four times
    val inv0 = CacheScope.cached(docs
      .select(col("lang"), col("doc_id"), explode_outer(col("shingles")).as("shingle"))
      .where(col("shingle").isNotNull))
    val rare = inv0.groupBy(col("lang"), col("shingle"))
      .agg(count(lit(1)).as("df")).where(col("df") <= maxDf)
      .select(col("lang"), col("shingle"))
    val inv = CacheScope.cached(inv0.join(rare, Seq("lang", "shingle")))
    val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = inv.select(col("lang"), col("shingle"), col("doc_id").as("contained_id"))
    val b = inv.select(col("lang"), col("shingle"), col("doc_id").as("container_id"))
    a.join(b, Seq("lang", "shingle"))
      .where(col("contained_id") =!= col("container_id"))
      .groupBy(col("contained_id"), col("container_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("contained_id"), col("sz")), Seq("contained_id"))
      .withColumn("containment", col("inter").cast(DoubleType) / col("sz").cast(DoubleType))
      .where(col("containment") >= threshold)
      .select(col("contained_id"), col("container_id"), col("containment"))
  }

  private val MinhashK = 16
  private val P = 2147483647L // 2^31 - 1

  /** Shingle hash in [0, P): portable md5-derived by default (exactly
    * reproducible by the DuckDB oracle); xxhash64 as the cheaper 100-TB
    * fast path (same distribution class, not oracle-checkable).
    */
  private def shingleHash(fastHash: Boolean): Column = {
    val h = if (fastHash) xxhash64(col("shingle"))
            else graft.functions.PortableHash.hash32(col("shingle"))
    pmod(h, lit(P))
  }

  /** Band hash: portable arithmetic combine of 4 signature values (all < P,
    * so products stay under 2^53 — exact in both engines).
    */
  private def bandHash(s0: Column, s1: Column, s2: Column, s3: Column): Column =
    pmod(s0 * 1000003L + s1 * 999983L + s2 * 757L + s3 * 131L, lit(P))

  /** k minhash signature columns from exploded shingles. */
  private def minhashSignatures(documents: DataFrame, fastHash: Boolean): DataFrame = {
    val sh = withTokens(documents, col("doc_id"), col("lang"))
      .select(col("doc_id"), col("lang"), explode_outer(shinglesCol(col("toks"))).as("shingle"))
      .where(col("shingle").isNotNull)
      .withColumn("x", shingleHash(fastHash))
    val sigAggs = (0 until MinhashK).map { i =>
      min(pmod(col("x") * (2 * i + 1) + (i * 12345 + 7), lit(P))).as(s"sig_$i")
    }
    sh.groupBy(col("doc_id"), col("lang")).agg(sigAggs.head, sigAggs.tail: _*)
  }

  /** `dedup_minhash_lsh`: 4 bands × 4 rows; candidates collide on any band
    * hash within a language; estimated Jaccard = matching signature fraction,
    * kept at ≥ 0.5. Oracle-exact via [[graft.functions.PortableHash]];
    * also verified against the exact n-gram Jaccard baseline in DedupSpec.
    */
  def dedupMinhashLsh(documents: DataFrame, fastHash: Boolean = false): DataFrame = {
    // cached: referenced by the band explode AND both sig re-attach joins —
    // uncached, the shingle-explode + 16-min aggregation would run 3×.
    // Scoped (not raw .cache()) so a session running many registered
    // queries doesn't accumulate one leaked signature cache per call.
    val sigs = CacheScope.cached(minhashSignatures(documents, fastHash))
    val sigArr = array((0 until MinhashK).map(i => col(s"sig_$i")): _*)
    val withBands = sigs
      .select(col("doc_id"), col("lang"),
        posexplode(array((0 until 4).map(b =>
          bandHash(col(s"sig_${4 * b}"), col(s"sig_${4 * b + 1}"),
            col(s"sig_${4 * b + 2}"), col(s"sig_${4 * b + 3}"))): _*))
          .as(Seq("band_idx", "band_hash")))
    val a = withBands.select(col("lang"), col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_id_1"))
    val b = withBands.select(col("lang"), col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_id_2"))
    // dedup candidates on scalar keys only; signatures re-attach afterwards
    // (distinct over array columns would dominate the cost)
    val candidates = a.join(b, Seq("lang", "band_idx", "band_hash"))
      .where(col("doc_id_1") < col("doc_id_2"))
      .select(col("lang"), col("doc_id_1"), col("doc_id_2"))
      .distinct()
    val sigTable = sigs.select(col("doc_id"), sigArr.as("sig"))
    candidates
      .join(sigTable.select(col("doc_id").as("doc_id_1"), col("sig").as("sig1")), Seq("doc_id_1"))
      .join(sigTable.select(col("doc_id").as("doc_id_2"), col("sig").as("sig2")), Seq("doc_id_2"))
      // native agreement count (graft.functions.LongEqCount): the HOF form
      // size(filter(zip_with(...))) is CodegenFallback and would drop this
      // verify projection — the hottest loop of the LSH join — out of
      // whole-stage codegen (PlanAuditSpec guards this)
      .withColumn("est_jaccard",
        long_eq_count(col("sig1"), col("sig2")).cast(DoubleType) / MinhashK.toDouble)
      .where(col("est_jaccard") >= 0.5)
      .select(col("doc_id_1"), col("doc_id_2"), col("lang"), col("est_jaccard"))
  }

  /** `dedup_incremental`: near-dup detection for a NEW batch against the
    * EXISTING corpus — the production dedup shape at 100 TB, where a daily
    * crawl increment must never trigger a corpus-wide re-dedup. The LSH
    * index (band hashes of every existing doc) is precomputed and stored in
    * production; an increment only shingles and signs ITS OWN docs and
    * probes their band hashes against the index, so per-increment cost is
    * O(batch + collisions), independent of corpus size. The probe join is
    * ASYMMETRIC (new side × index side, no new×new or existing×existing
    * pairs — the batch's internal dups are its own batch-dedup pass), and
    * candidate verification is the same signature-agreement projection as
    * [[dedupMinhashLsh]]. Demo partitioning: doc_id % 4 == 0 is "the new
    * batch"; both sides derive from one table because the driver contract
    * is a single query — the PLAN is the production probe shape.
    */
  def dedupIncremental(documents: DataFrame, fastHash: Boolean = false): DataFrame = {
    val sigs = CacheScope.cached(minhashSignatures(documents, fastHash))
    val sigArr = array((0 until MinhashK).map(i => col(s"sig_$i")): _*)
    val withBands = sigs
      .select(col("doc_id"), col("lang"),
        posexplode(array((0 until 4).map(b =>
          bandHash(col(s"sig_${4 * b}"), col(s"sig_${4 * b + 1}"),
            col(s"sig_${4 * b + 2}"), col(s"sig_${4 * b + 3}"))): _*))
          .as(Seq("band_idx", "band_hash")))
    val probe = withBands.where(col("doc_id") % 4 === 0)
      .select(col("lang"), col("band_idx"), col("band_hash"),
        col("doc_id").as("new_doc_id"))
    val index = withBands.where(col("doc_id") % 4 =!= 0)
      .select(col("lang"), col("band_idx"), col("band_hash"),
        col("doc_id").as("existing_doc_id"))
    val candidates = probe.join(index, Seq("lang", "band_idx", "band_hash"))
      .select(col("lang"), col("new_doc_id"), col("existing_doc_id"))
      .distinct()
    val sigTable = sigs.select(col("doc_id"), sigArr.as("sig"))
    candidates
      .join(sigTable.select(col("doc_id").as("new_doc_id"), col("sig").as("sig1")),
        Seq("new_doc_id"))
      .join(sigTable.select(col("doc_id").as("existing_doc_id"), col("sig").as("sig2")),
        Seq("existing_doc_id"))
      .withColumn("est_jaccard",
        long_eq_count(col("sig1"), col("sig2")).cast(DoubleType) / MinhashK.toDouble)
      .where(col("est_jaccard") >= 0.5)
      .select(col("new_doc_id"), col("existing_doc_id"), col("lang"), col("est_jaccard"))
  }

  /** Paragraph chunking for span-level dedup: fixed `window`-word spans
    * (the realistic chunking for corpora whose paragraph boundaries are
    * unreliable or absent), capped at `MaxParas` spans per document, each
    * reshaped to the (doc_id, lang, text) contract of the minhash machinery
    * with the packed span id `doc_id * MaxParas + para_idx`.
    */
  private[operators] val ParaWindow = 20
  private[operators] val MaxParas = 100

  private def paragraphs(documents: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), " ")
    documents
      .select(col("doc_id"), col("lang"), toks.as("toks"))
      .select(col("doc_id"), col("lang"), col("toks"),
        explode(sequence(lit(0L),
          least(ceil(size(col("toks")) / lit(ParaWindow.toDouble)).cast("long"),
            lit(MaxParas.toLong)) - 1)).as("pi"))
      .select(
        (col("doc_id") * MaxParas + col("pi")).as("doc_id"),
        col("lang"),
        concat_ws(" ",
          slice(col("toks"), (col("pi") * ParaWindow + 1).cast("int"), lit(ParaWindow)))
          .as("text"))
  }

  /** `dedup_minhash_eval`: precision/recall of the banded minhash-LSH
    * pipeline against EXACT n-gram Jaccard ground truth — the dedup
    * family's analogue of [[Similarity.simSearchRecallEval]]: before
    * trusting a banding configuration on a corpus, measure what its
    * collisions+signature-estimate actually capture of the true ≥0.5-
    * Jaccard pair set. One row per language: true pairs, LSH candidate
    * pairs (post est_jaccard ≥ 0.5, [[dedupMinhashLsh]]'s exact output
    * contract), hits, and exact-integer precision/recall ppm.
    *
    * Truth protocol (the production recall-audit shape): exact Jaccard is
    * the quadratic part, so it is computed for a bounded QUERY SAMPLE only
    * (doc_id % `sampleMod` == 0 — a modulus sample, id-distribution-free,
    * where an id-prefix sample would cluster in one corner of the corpus) —
    * each sample doc's distinct-shingle set probes the corpus shingle
    * table by (lang, shingle) key, so the exact side is a keyed join
    * driven by sample shingles, never all-pairs. A pair counts when EITHER
    * member is sampled (canonicalized least/greatest; the both-sampled
    * case kept once). J ≥ 0.5 is decided in integers
    * (3·|∩| ≥ |A|+|B| ⇔ |∩|/(|A|+|B|−|∩|) ≥ 1/2). Truth is
    * within-language, matching the LSH's own blocking contract. Every
    * language with a sampled doc gets its row even with zero pairs (the
    * zero-row-guard discipline: an empty eval must still certify
    * emptiness per language, not vanish); division-by-zero edges report
    * 10⁶, mirrored in the oracle.
    */
  /** The sampled exact-Jaccard ground truth shared by [[dedupMinhashEval]]
    * and [[dedupBandCurve]] — (lang, doc_id_1, doc_id_2) pairs with true
    * J ≥ 0.5 where either member is sampled (doc_id % sampleMod == 0).
    * See [[dedupMinhashEval]]'s scaladoc for the protocol rationale.
    */
  private def sampledExactTruth(documents: DataFrame, sampleMod: Long): DataFrame = {
    val sh = withTokens(documents, col("doc_id"), col("lang"))
      .select(col("doc_id"), col("lang"),
        array_distinct(shinglesCol(col("toks"))).as("shingles"))
    val sizes = sh.select(col("doc_id"),
      org.apache.spark.sql.functions.size(col("shingles")).cast("long").as("n_sh"))
    val ex = sh.select(col("doc_id"), col("lang"),
      explode_outer(col("shingles")).as("shingle"))
      .where(col("shingle").isNotNull)
    val sampled = col("doc_id") % sampleMod === 0
    // both-sampled pairs would arrive in both orientations: keep q < c
    // there; a non-sampled partner appears exactly once by construction
    val inter = ex.where(sampled)
      .select(col("lang"), col("shingle"), col("doc_id").as("q"))
      .join(ex.select(col("lang"), col("shingle"), col("doc_id").as("c")),
        Seq("lang", "shingle"))
      .where(col("q") =!= col("c") &&
        (col("c") % sampleMod =!= 0 || col("q") < col("c")))
      .groupBy(col("lang"), least(col("q"), col("c")).as("doc_id_1"),
        greatest(col("q"), col("c")).as("doc_id_2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_id_1"), col("n_sh").as("n1")), Seq("doc_id_1"))
      .join(sizes.select(col("doc_id").as("doc_id_2"), col("n_sh").as("n2")), Seq("doc_id_2"))
      .where(col("inter") * 3 >= col("n1") + col("n2"))
      .select(col("lang"), col("doc_id_1"), col("doc_id_2"))
  }

  def dedupMinhashEval(documents: DataFrame, sampleMod: Long = 5L): DataFrame = {
    val truth = sampledExactTruth(documents, sampleMod)
    val sampled = col("doc_id") % sampleMod === 0
    val cand = dedupMinhashLsh(documents)
      .where(col("doc_id_1") % sampleMod === 0 || col("doc_id_2") % sampleMod === 0)
      .select(col("lang"), col("doc_id_1"), col("doc_id_2"))
    val grid = documents.where(sampled).select(col("lang")).distinct()
    val tl = truth.groupBy(col("lang")).agg(count(lit(1)).as("truth_pairs"))
    val cl = cand.groupBy(col("lang")).agg(count(lit(1)).as("cand_pairs"))
    val hl = truth.join(cand, Seq("lang", "doc_id_1", "doc_id_2"), "left_semi")
      .groupBy(col("lang")).agg(count(lit(1)).as("hits"))
    // tl/cl/hl are |languages| rows — broadcast onto the grid
    grid.join(broadcast(tl), Seq("lang"), "left")
      .join(broadcast(cl), Seq("lang"), "left")
      .join(broadcast(hl), Seq("lang"), "left")
      .select(col("lang"),
        coalesce(col("truth_pairs"), lit(0L)).as("truth_pairs"),
        coalesce(col("cand_pairs"), lit(0L)).as("cand_pairs"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("precision_ppm",
        when(col("cand_pairs") > 0, expr("hits * 1000000 div cand_pairs"))
          .otherwise(lit(1000000L)))
      .withColumn("recall_ppm",
        when(col("truth_pairs") > 0, expr("hits * 1000000 div truth_pairs"))
          .otherwise(lit(1000000L)))
  }

  /** Banding configurations for [[dedupBandCurve]]: (bands, rows-per-band)
    * splits of the [[MinhashK]] = 16 signatures. More bands × fewer rows →
    * higher collision probability at a given Jaccard (recall up, raw
    * candidate volume up); the (4, 4) point reuses [[bandHash]]'s exact
    * coefficients, so that row of the curve IS the production
    * `dedup_minhash_lsh` configuration.
    */
  private[graft] val BandConfigs: Seq[(Int, Int)] = Seq((2, 8), (4, 4), (8, 2))

  /** Portable band-combine coefficients (prefix order matters: the first
    * four match [[bandHash]] so the (4,4) curve point equals the shipped
    * operator). All < 2²¹, signatures < 2³¹ ⇒ an 8-term combine stays
    * under 2⁵⁴ — exact BIGINT in both engines.
    */
  private val BandCoef: Seq[Long] =
    Seq(1000003L, 999983L, 757L, 131L, 10007L, 9973L, 577L, 89L)

  /** `dedup_band_curve`: precision/recall of banded minhash-LSH as a
    * function of the (bands × rows) split — THE tuning curve for the
    * dedup family's one free knob, the banding analogue of
    * [[Similarity.simSearchNprobeCurve]]. The LSH theory says a band of r
    * rows collides with probability J^r, so b bands catch a J-similar pair
    * with 1 − (1 − J^r)^b: at J = 0.5, (2, 8) ≈ 0.8%, (4, 4) ≈ 22%,
    * (8, 2) ≈ 90% — the curve turns that folklore into a measured table
    * against [[sampledExactTruth]]'s exact-Jaccard ground truth, per
    * config per language: raw collision pairs (the COST — candidate reads
    * the verify stage must do), verified pairs (est_jaccard ≥ 0.5, the
    * operator's output contract), hits, precision, recall.
    *
    * Reading the curve: pick the leftmost config whose recall clears the
    * SLA — each step right multiplies raw candidate volume (the 100-TB
    * cost driver) for a recall gain that saturates. Scale shape: the
    * signature table is computed ONCE (CacheScope-staged, same as
    * [[dedupMinhashLsh]]) and each config adds only its own
    * band-explode + bucket self-join — work ∝ Σ_config collisions, never
    * all-pairs; the truth side is the sampled keyed join of
    * [[dedupMinhashEval]], shared across configs.
    */
  def dedupBandCurve(documents: DataFrame, sampleMod: Long = 5L): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val truth = CacheScope.cached(sampledExactTruth(documents, sampleMod))
    val sigs = CacheScope.cached(minhashSignatures(documents, fastHash = false))
    val sigArr = array((0 until MinhashK).map(i => col(s"sig_$i")): _*)
    val sigTable = sigs.select(col("doc_id"), sigArr.as("sig"))
    val sampledPair =
      col("doc_id_1") % sampleMod === 0 || col("doc_id_2") % sampleMod === 0
    val perConfig = BandConfigs.map { case (b, r) =>
      val bandCols = (0 until b).map { j =>
        pmod((0 until r).map(t => col(s"sig_${r * j + t}") * BandCoef(t))
          .reduce(_ + _), lit(P))
      }
      val withBands = sigs.select(col("doc_id"), col("lang"),
        posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
      val a = withBands.select(col("lang"), col("band_idx"), col("band_hash"),
        col("doc_id").as("doc_id_1"))
      val bb = withBands.select(col("lang"), col("band_idx"), col("band_hash"),
        col("doc_id").as("doc_id_2"))
      val raw = a.join(bb, Seq("lang", "band_idx", "band_hash"))
        .where(col("doc_id_1") < col("doc_id_2"))
        .select(col("lang"), col("doc_id_1"), col("doc_id_2"))
        .distinct()
        .where(sampledPair)
      // all three counts in ONE derivation (the oracle's flag CTE shape):
      // raw/kept/hit as flags on the candidate set, aggregated once — a
      // per-count frame would replan the bucket self-join three times, and
      // staging each raw would evict truth/sigs from the bounded
      // CacheScope registry (keep=4) and recompute the signature chain
      val flagged = raw
        .join(sigTable.select(col("doc_id").as("doc_id_1"), col("sig").as("sig1")),
          Seq("doc_id_1"))
        .join(sigTable.select(col("doc_id").as("doc_id_2"), col("sig").as("sig2")),
          Seq("doc_id_2"))
        .join(truth.withColumn("is_true", lit(1L)),
          Seq("lang", "doc_id_1", "doc_id_2"), "left")
        .select(col("lang"),
          (long_eq_count(col("sig1"), col("sig2")) * 2 >= MinhashK).as("kept"),
          col("is_true").isNotNull.as("is_true"))
      flagged.groupBy(col("lang"))
        .agg(count(lit(1)).as("raw_pairs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("kept_pairs"),
          sum(when(col("kept") && col("is_true"), 1L).otherwise(0L)).as("hits"))
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          col("lang"), col("raw_pairs"), col("kept_pairs"), col("hits"))
    }.reduce(_ unionByName _)
    val grid = documents.where(col("doc_id") % sampleMod === 0)
      .select(col("lang")).distinct()
      .crossJoin(BandConfigs.map { case (b, r) => (b.toLong, r.toLong) }
        .toDF("bands", "rows_per_band"))
    val tl = truth.groupBy(col("lang")).agg(count(lit(1)).as("truth_pairs"))
    grid.join(broadcast(tl), Seq("lang"), "left")
      .join(broadcast(perConfig), Seq("lang", "bands", "rows_per_band"), "left")
      .select(col("bands"), col("rows_per_band"), col("lang"),
        coalesce(col("truth_pairs"), lit(0L)).as("truth_pairs"),
        coalesce(col("raw_pairs"), lit(0L)).as("raw_pairs"),
        coalesce(col("kept_pairs"), lit(0L)).as("kept_pairs"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("precision_ppm",
        when(col("kept_pairs") > 0, expr("hits * 1000000 div kept_pairs"))
          .otherwise(lit(1000000L)))
      .withColumn("recall_ppm",
        when(col("truth_pairs") > 0, expr("hits * 1000000 div truth_pairs"))
          .otherwise(lit(1000000L)))
  }

  /** `dedup_paragraph`: CROSS-document near-duplicate SPANS — the curation
    * operator for template/boilerplate text shared between otherwise
    * distinct documents (intra-document repetition is
    * `text_boilerplate_ngrams`; whole-document near-dup is
    * `dedup_minhash_lsh`). Each document is chunked into [[ParaWindow]]-word
    * spans and the spans flow through the SAME banded minhash-LSH machinery
    * (shingle → sign → band → bucket join → signature verify), so the scale
    * story is inherited: work ∝ colliding spans, never all pairs. Pairs
    * within one document are dropped; span ids decode back to
    * (doc_id, para_idx).
    */
  def dedupParagraph(documents: DataFrame, fastHash: Boolean = false): DataFrame = {
    val spanPairs = dedupMinhashLsh(paragraphs(documents), fastHash)
    spanPairs
      .where(expr(s"doc_id_1 div $MaxParas") =!= expr(s"doc_id_2 div $MaxParas"))
      .select(
        expr(s"doc_id_1 div $MaxParas").as("doc_a"),
        pmod(col("doc_id_1"), lit(MaxParas.toLong)).as("para_a"),
        expr(s"doc_id_2 div $MaxParas").as("doc_b"),
        pmod(col("doc_id_2"), lit(MaxParas.toLong)).as("para_b"),
        col("lang"), col("est_jaccard"))
  }

  /** `dedup_substring`: cross-document EXACT substring spans — the
    * suffix-array dedup class (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better": exact long spans repeated across
    * documents), re-expressed by WINNOWING (Schleimer et al. 2003, the
    * MOSS fingerprinting algorithm), which is what makes it parallel: a
    * suffix array is inherently sequential to build, and naive strided
    * sampling of windows silently misses copies whose offsets differ mod
    * the stride. Winnowing selects fingerprints by CONTENT — the minimum
    * window-hash within each run of `w` consecutive positions — so two
    * copies of a span elect the SAME fingerprints no matter where each
    * copy sits in its document, with the classic guarantee: any shared
    * span of length ≥ width + w − 1 (here 49 chars) yields at least one
    * common fingerprint, and no shared fingerprint is shorter than
    * `width` chars.
    *
    * Scale shape: one row per char position pre-winnow, ~2/(w+1) of them
    * survive as fingerprints; the only wide shuffles are partitionBy
    * (doc_id) for the winnow (bounded ROWS frame, O(1) state) and the
    * fingerprint groupBy, which counts DISTINCT docs per span hash —
    * within-doc repeats are `text_repetition`'s business, not dup spans.
    * Docs with a flagged fingerprint join back against the same hash
    * partitioning. Never all-pairs. The md5 window hash keeps the oracle
    * exact; the production fast path swaps in a rolling hash
    * (graft.functions.RollingHash) making per-position cost O(1).
    */
  def dedupSubstring(
      documents: DataFrame, width: Int = 40, w: Int = 10): DataFrame = {
    val base = documents
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .where(col("len") >= width)
    // every window position (suffix-array coverage), hashed
    val hashed = base
      .select(col("doc_id"),
        explode(sequence(lit(0L), expr(s"len - $width"))).as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"),
        md5(expr(s"substring(text, cast(pos + 1 as int), $width)")).as("h"))
    // winnow: each trailing run of w positions elects its min hash; the
    // doc's fingerprint set is the DISTINCT elected values (hex strings
    // compare bytewise-identically in Spark and the oracle)
    val winnowFrame = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), Window.currentRow)
    val fps = hashed
      .withColumn("fp", min(col("h")).over(winnowFrame))
      .select(col("doc_id"), col("fp"))
      .distinct()
    val dupFps = fps
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs")) // fps is already doc-distinct
      .where(col("n_docs") >= 2)
      .select(col("fp"))
    val perDoc = fps.join(dupFps, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_fingerprints"))
    fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fingerprints"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_fingerprints"),
        coalesce(col("n_dup_fingerprints"), lit(0L)).as("n_dup_fingerprints"),
        (coalesce(col("n_dup_fingerprints"), lit(0L)).cast("double") /
          col("n_fingerprints").cast("double")).as("dup_fraction"))
  }

  /** `dedup_simhash`: simhash over shingle hashes, banded candidate join,
    * near-dup at hamming ≤ 3. Two signature widths, one code path:
    *
    *  - portable (oracled): 16 bits, 4-bit nibble bands — every arithmetic
    *    step reproduced by the DuckDB twin via
    *    [[graft.functions.PortableHash]]; recall checked in DedupSpec.
    *  - fast (the 100-TB path): 64-bit xxhash simhash, banded on the
    *    block-permutation scheme of Manku/Jain/Sarma (WWW'07, §3): the 64
    *    bits split into 6 blocks (4×11 + 2×10 bits) and each of the
    *    C(6,3) = 20 three-block combinations keys a band (~32-bit keys).
    *    Band-key width is THE scale variable: expected candidate volume is
    *    n²·bands/keyspace, so 4 × 16-bit bands (the first fast form) went
    *    quadratic at the x100 scale point (9.4× cpu for 3.3× data,
    *    docs/SCALE.md) exactly as n²·4/2¹⁶ predicts, while 20 three-block
    *    bands put the keyspace at ~2³² — ~13,000× fewer expected
    *    collisions for 5× the (linear) explode volume, pushing the
    *    quadratic knee past 10⁹ docs per language.
    *
    * Both schemes keep the hamming ≤ 3 guarantee lossless by pigeonhole —
    * 3 flipped bits touch ≤ 3 blocks, so 3 of the 6 blocks are intact and
    * THAT three-block combination is one of the 20 bands (for the portable
    * 4-band form: ≤ 3 of 4 nibbles touched, one nibble agrees) — and the
    * `_fast` seeded-recall audit holds under ANY banding — identical docs
    * have identical signatures, collide in every band, and verify at
    * hamming 0.
    */
  def dedupSimhash(documents: DataFrame, fastHash: Boolean = false): DataFrame = {
    val bits = if (fastHash) 64 else 16
    val sh = withTokens(documents, col("doc_id"), col("lang"))
      .select(col("doc_id"), col("lang"), explode_outer(shinglesCol(col("toks"))).as("shingle"))
      .where(col("shingle").isNotNull)
      // full 64 independent bits for the fast sig (no P-mod, which would
      // zero the high bits); the portable sig keeps its oracled 16-bit form
      .withColumn("x", if (fastHash) xxhash64(col("shingle"))
                       else pmod(shingleHash(fastHash), lit(65536L)))
    val bitAggs = (0 until bits).map { bit =>
      sum(when(shiftrightunsigned(col("x"), bit) % 2 === 1, 1).otherwise(-1)).as(s"b_$bit")
    }
    // staged (r17, guide §2.4): the banded self-join evaluates BOTH legs,
    // and unstaged each leg re-ran the whole signature pipeline — tokenize,
    // shingle explode, per-shingle hash, 2×`bits` partial sums — over the
    // corpus (the plan scanned documents twice). The staged frame is 3
    // columns per doc; the explode it absorbs is shingle-count-sized.
    val sig = CacheScope.cached(sh.groupBy(col("doc_id"), col("lang"))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .withColumn("simhash",
        (0 until bits).map(bit =>
          when(col(s"b_$bit") >= 0, 1L << bit).otherwise(0L)).reduce(_ + _))
      .select(col("doc_id"), col("lang"), col("simhash")))
    val bandKeys: Seq[Column] =
      if (fastHash) {
        // 6 blocks of the 64-bit sig; a band per 3-block combination. Keys
        // pack into one long (block values < 2¹¹, so 11-bit lanes suffice).
        val widths = Seq(11, 11, 11, 11, 10, 10)
        val offsets = widths.scanLeft(0)(_ + _).init
        def block(i: Int): Column =
          pmod(shiftrightunsigned(col("simhash"), offsets(i)), lit(1L << widths(i)))
        for {
          i <- 0 until 6; j <- (i + 1) until 6; k <- (j + 1) until 6
        } yield shiftleft(block(i), 22) + shiftleft(block(j), 11) + block(k)
      } else
        (0 until 4).map(band =>
          pmod(shiftrightunsigned(col("simhash"), band * 4), lit(16L)))
    val banded = sig.select(col("doc_id"), col("lang"), col("simhash"),
      posexplode(array(bandKeys: _*)).as(Seq("nib_idx", "nib_val")))
    val a = banded.select(col("lang"), col("nib_idx"), col("nib_val"),
      col("doc_id").as("doc_id_1"), col("simhash").as("h1"))
    val b = banded.select(col("lang"), col("nib_idx"), col("nib_val"),
      col("doc_id").as("doc_id_2"), col("simhash").as("h2"))
    a.join(b, Seq("lang", "nib_idx", "nib_val"))
      .where(col("doc_id_1") < col("doc_id_2"))
      .select(col("lang"), col("doc_id_1"), col("doc_id_2"), col("h1"), col("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long"))
      .where(col("hamming") <= 3)
      .select(col("doc_id_1"), col("doc_id_2"), col("lang"), col("hamming"))
  }

  // ---------------------------------------------------------------------
  // Seeded-recall audits for the xxhash64 `_fast` twins.
  //
  // The fast hash has no DuckDB twin, so the fast pipelines' raw pair lists
  // cannot be value-checked cross-engine. What CAN be checked exactly — for
  // ANY hash function — is the mathematical recall floor on identical
  // inputs: two documents with identical (text, lang) produce identical
  // token arrays, hence identical shingle sets, hence identical minhash
  // signatures / simhash values, hence collide in EVERY band and pass
  // verification (est_jaccard = 1, hamming = 0). So every identical pair
  // MUST appear in the output, whatever the hash. The audited `_fast`
  // queries run the full xxhash pipeline and report that floor:
  //
  //   n_docs        — corpus size (cross-engine anchor)
  //   n_true_pairs  — identical (text, lang) pairs, both engines compute it
  //   n_true_found  — of those, how many the fast pipeline emitted; the
  //                   oracle asserts == n_true_pairs (the guarantee above)
  //
  // Because the synthetic corpus is nearly duplicate-free at small SF, four
  // SENTINEL documents (two identical pairs, one multi-span) are unioned in
  // — the standard seeded-canary recall probe of a production dedup: plant
  // known duplicates, fail loudly if the pipeline ever stops finding them.
  // A banding/verification regression (wrong band width, broken signature
  // agreement, dropped lang block) drives n_true_found below n_true_pairs
  // and the driver's hash compare fails.
  // ---------------------------------------------------------------------

  /** 45 tokens → 3 paragraph spans (20/20/5), all ≥ 3 tokens. */
  private[operators] val SentinelTextA: String =
    "sentinel alpha corpus canary copy one two three four five six seven " +
      "eight nine ten eleven twelve thirteen fourteen fifteen sixteen " +
      "seventeen eighteen nineteen twenty alpha bravo charlie delta echo " +
      "foxtrot golf hotel india juliet kilo lima mike november oscar papa " +
      "quebec romeo sierra tango"

  /** 25 tokens → 2 paragraph spans (20/5), both ≥ 3 tokens. */
  private[operators] val SentinelTextB: String =
    "zweiter kanarienvogel text kopie eins zwei drei vier fuenf sechs " +
      "sieben acht neun zehn elf zwoelf dreizehn vierzehn fuenfzehn " +
      "sechzehn siebzehn achtzehn neunzehn zwanzig ende"

  /** documents ∪ the four sentinel canaries (ids far above any real SF). */
  private def withSentinels(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val s = Seq(
      (9000000001L, SentinelTextA, "en"), (9000000002L, SentinelTextA, "en"),
      (9000000003L, SentinelTextB, "de"), (9000000004L, SentinelTextB, "de"))
      .toDF("doc_id", "text", "lang")
    documents.select(col("doc_id"), col("text"), col("lang")).unionByName(s)
  }

  /** Identical (text, lang) pairs with ≥ 3 tokens (≥ 1 shingle — shorter
    * docs never sign, so they are outside the recall floor). Joined on the
    * md5 digest: the shuffle carries 32-byte keys, never bodies — the
    * dedup_exact discipline.
    */
  private def identicalPairs(docs: DataFrame): DataFrame = {
    val eligible = docs
      .where(size(split(lower(col("text")), " ")) >= 3)
      .select(md5(col("text")).as("k"), col("lang"), col("doc_id"))
    eligible.select(col("k"), col("lang"), col("doc_id").as("doc_id_1"))
      .join(eligible.select(col("k"), col("lang"), col("doc_id").as("doc_id_2")),
        Seq("k", "lang"))
      .where(col("doc_id_1") < col("doc_id_2"))
      .select(col("doc_id_1"), col("doc_id_2"))
  }

  /** One-row audit frame: corpus size, truth size, truth recovered. */
  private def recallFloorAudit(
      docs: DataFrame, truth: DataFrame, found: DataFrame,
      keys: Seq[String]): DataFrame = {
    // truth is read twice (count + recovery semi-join); staged, the
    // md5-digest self-join that derives it runs once per action, not twice
    val truthS = CacheScope.cached(truth)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val nTrue = truthS.agg(count(lit(1)).as("n_true_pairs"))
    val nFound = truthS.join(found, keys, "left_semi")
      .agg(count(lit(1)).as("n_true_found"))
    nDocs.crossJoin(nTrue).crossJoin(nFound)
  }

  /** `dedup_minhash_lsh_fast`: the xxhash64 production pipeline under the
    * seeded-recall audit (see block comment above).
    */
  def dedupMinhashLshFastAudit(documents: DataFrame): DataFrame = {
    val docs = withSentinels(documents)
    recallFloorAudit(docs, identicalPairs(docs),
      dedupMinhashLsh(docs, fastHash = true), Seq("doc_id_1", "doc_id_2"))
  }

  /** `dedup_simhash_fast`: xxhash64 simhash under the seeded-recall audit. */
  def dedupSimhashFastAudit(documents: DataFrame): DataFrame = {
    val docs = withSentinels(documents)
    recallFloorAudit(docs, identicalPairs(docs),
      dedupSimhash(docs, fastHash = true), Seq("doc_id_1", "doc_id_2"))
  }

  /** `dedup_paragraph_fast`: xxhash64 span dedup under the seeded-recall
    * audit. Truth = for every identical (text, lang) doc pair, every
    * paragraph index whose span carries ≥ 3 tokens (arithmetic on the token
    * count — mirrors [[paragraphs]]' window/cap exactly): identical docs
    * share every such span pairwise, so each must be recovered.
    */
  def dedupParagraphFastAudit(documents: DataFrame): DataFrame = {
    val docs = withSentinels(documents)
    val e = docs.select(md5(col("text")).as("k"), col("lang"), col("doc_id"),
      size(split(lower(col("text")), " ")).cast("long").as("nt"))
    val pairs = e.select(col("k"), col("lang"), col("doc_id").as("doc_a"), col("nt"))
      .join(e.select(col("k"), col("lang"), col("doc_id").as("doc_b")), Seq("k", "lang"))
      .where(col("doc_a") < col("doc_b"))
    val truth = pairs
      .select(col("doc_a"), col("doc_b"), col("nt"),
        explode(sequence(lit(0L),
          least(ceil(col("nt") / lit(ParaWindow.toDouble)).cast("long"),
            lit(MaxParas.toLong)) - 1)).as("pi"))
      .where(least(lit(ParaWindow.toLong), col("nt") - col("pi") * ParaWindow) >= 3)
      .select(col("doc_a"), col("pi").as("para_a"), col("doc_b"), col("pi").as("para_b"))
    recallFloorAudit(docs, truth, dedupParagraph(docs, fastHash = true),
      Seq("doc_a", "para_a", "doc_b", "para_b"))
  }

  private val sentinelDocsCte: String =
    s"""docs AS (
       |  SELECT doc_id, text, lang FROM documents
       |  UNION ALL
       |  SELECT * FROM (VALUES
       |    (9000000001, '$SentinelTextA', 'en'),
       |    (9000000002, '$SentinelTextA', 'en'),
       |    (9000000003, '$SentinelTextB', 'de'),
       |    (9000000004, '$SentinelTextB', 'de')) v(doc_id, text, lang))""".stripMargin

  /** Oracle for the whole-document recall-floor audits: n_true_found equals
    * n_true_pairs BY THE GUARANTEE — a shortfall on the Spark side is
    * exactly what the audit exists to catch.
    */
  private val recallFloorOracle: String =
    s"""WITH $sentinelDocsCte,
       |eligible AS (
       |  SELECT doc_id, text, lang FROM docs
       |  WHERE len(string_split(lower(text), ' ')) >= 3),
       |truth AS (
       |  SELECT count(*) AS n FROM eligible a JOIN eligible b
       |    ON a.text = b.text AND a.lang = b.lang AND a.doc_id < b.doc_id)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM docs) AS n_docs,
       |       CAST(n AS BIGINT) AS n_true_pairs,
       |       CAST(n AS BIGINT) AS n_true_found
       |FROM truth""".stripMargin

  private val paragraphRecallFloorOracle: String =
    s"""WITH $sentinelDocsCte,
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         len(string_split(lower(a.text), ' ')) AS nt
       |  FROM docs a JOIN docs b
       |    ON a.text = b.text AND a.lang = b.lang AND a.doc_id < b.doc_id),
       |spans AS (
       |  SELECT doc_a, doc_b, nt,
       |         UNNEST(range(0, LEAST(CAST(CEIL(nt / $ParaWindow.0) AS BIGINT),
       |                               $MaxParas))) AS pi
       |  FROM pairs),
       |truth AS (
       |  SELECT count(*) AS n FROM spans
       |  WHERE LEAST($ParaWindow, nt - pi * $ParaWindow) >= 3)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM docs) AS n_docs,
       |       CAST(n AS BIGINT) AS n_true_pairs,
       |       CAST(n AS BIGINT) AS n_true_found
       |FROM truth""".stripMargin

  /** Quantized embedding: ARRAY<BIGINT> of round(x * 1e4). */
  private[operators] def quantized(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"), col("label").cast("long").as("label"),
      // cast float→double BEFORE scaling: both engines then do one exact
      // double multiply; float-precision multiply would round differently
      transform(col("embedding"), x => round(x.cast(DoubleType) * 10000).cast("long")).as("q"))

  private def cosine(dot: Column, n1: Column, n2: Column): Column =
    dot.cast(DoubleType) / (sqrt(n1.cast(DoubleType)) * sqrt(n2.cast(DoubleType)))

  /** Deterministic ≥0.95-cosine companions planted into the embeddings
    * corpus — the registered `dedup_embedding_*` queries' prep step. The
    * driver's synthetic embeddings contain NO natural pair above the 0.95
    * frontier at any sf, so without planting all four oracles certify
    * emptiness (0 = 0). Every 29th vec_id gets a companion at
    * vec_id + 10⁷ (far above any corpus id): ids ≡ 0 (mod 58) an EXACT
    * clone (cosine 1 — the guaranteed-recall floor), ids ≡ 29 (mod 58) a
    * sign-flip of dimension 0 (cosine = 1 − 2·q₀²/‖q‖² after quantization
    * — exact integer arithmetic, straddling the threshold per-vector, so
    * the cut itself is exercised, not just trivially cleared). Float
    * negation is bit-exact and quantization happens downstream in both
    * engines, so [[plantedCte]] reproduces the same companions in SQL
    * term for term. Scales with the corpus (N/29 companions).
    */
  def plantNearDupes(embeddings: DataFrame): DataFrame = {
    val companions = embeddings.where(col("vec_id") % 29 === 0)
      .withColumn("embedding",
        when(col("vec_id") % 58 =!= 0,
          transform(col("embedding"), (x, i) => when(i === 0, -x).otherwise(x)))
          .otherwise(col("embedding")))
      .withColumn("vec_id", col("vec_id") + 10000000L)
    embeddings.unionByName(companions)
  }

  /** [[plantNearDupes]] in SQL: CTE `emb_planted` with the same schema as
    * `embeddings`; the oracles below chain Similarity.quantCteFrom on it.
    */
  private val plantedCte: String =
    """emb_planted AS (
      |  SELECT vec_id, embedding, label FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 10000000, CASE WHEN vec_id % 58 != 0
      |           THEN list_concat([-embedding[1]], embedding[2:])
      |           ELSE embedding END AS embedding, label
      |  FROM embeddings WHERE vec_id % 29 = 0)""".stripMargin

  /** `dedup_embedding_cosine`: near-duplicate vectors (cosine ≥ 0.95) within
    * a label block, exact integer dot via the LongDot codegen expression.
    */
  def dedupEmbeddingCosine(embeddings: DataFrame): DataFrame = {
    val q = quantized(embeddings).withColumn("norm2", long_dot(col("q"), col("q")))
    val a = q.select(col("label"), col("vec_id").as("vec_id_1"),
      col("q").as("q1"), col("norm2").as("n1"))
    val b = q.select(col("label"), col("vec_id").as("vec_id_2"),
      col("q").as("q2"), col("norm2").as("n2"))
    a.join(b, Seq("label"))
      .where(col("vec_id_1") < col("vec_id_2"))
      .withColumn("cosine", cosine(long_dot(col("q1"), col("q2")), col("n1"), col("n2")))
      .where(col("cosine") >= 0.95)
      .select(col("vec_id_1"), col("vec_id_2"), col("label"), col("cosine"))
  }

  /** Shared oracle CTEs: shingle sets → exploded → portable hash in [0, P).
    * Mirrors `tokensCol`/`shinglesCol`/`shingleHash` exactly; `src` is the
    * (doc_id, lang, text) relation to shingle — `documents`, or the
    * paragraph CTE for span-level dedup.
    */
  private def hashedShingleCtesFrom(src: String): String = {
    val h = graft.functions.PortableHash.duckSql("shingle")
    s"""toks AS (
       |  SELECT doc_id, lang, string_split(lower(text), ' ') AS tokens
       |  FROM $src),
       |sh AS (
       |  SELECT doc_id, lang,
       |         list_distinct(list_transform(
       |           range(1, greatest(len(tokens) - 1, 1)),
       |           i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingles
       |  FROM toks),
       |hx AS (
       |  SELECT doc_id, lang, UNNEST(shingles) AS shingle FROM sh),
       |xs AS (
       |  SELECT doc_id, lang, $h % 2147483647 AS x FROM hx)""".stripMargin
  }

  private val hashedShingleCtes: String = hashedShingleCtesFrom("documents")

  /** Everything of the minhash oracle up to the `est` CTE (candidate pairs
    * with estimated jaccard) — shared by the document-level and
    * paragraph-level final selects.
    */
  private def minhashCtes(shingleCtes: String): String = {
    val sigCols = (0 until MinhashK).map(i =>
      s"MIN((x * ${2 * i + 1} + ${i * 12345 + 7}) % 2147483647) AS sig_$i").mkString(",\n         ")
    val bandCases = (0 until 4).map { b =>
      s"WHEN ${b} THEN (sig_${4 * b} * 1000003 + sig_${4 * b + 1} * 999983 + " +
        s"sig_${4 * b + 2} * 757 + sig_${4 * b + 3} * 131) % 2147483647"
    }.mkString("\n           ")
    val matchTerms = (0 until MinhashK).map(i =>
      s"(CASE WHEN s1.sig_$i = s2.sig_$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""$shingleCtes,
       |sig AS (
       |  SELECT doc_id, lang,
       |         $sigCols
       |  FROM xs GROUP BY doc_id, lang),
       |bands AS (
       |  SELECT doc_id, lang, b.band_idx,
       |         CASE b.band_idx
       |           $bandCases
       |         END AS band_hash
       |  FROM sig CROSS JOIN (SELECT UNNEST(range(0, 4)) AS band_idx) b),
       |cand AS (
       |  SELECT DISTINCT a.lang, a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
       |  FROM bands a JOIN bands b
       |    ON a.lang = b.lang AND a.band_idx = b.band_idx
       |   AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
       |est AS (
       |  SELECT c.doc_id_1, c.doc_id_2, c.lang,
       |         CAST($matchTerms AS DOUBLE) / 16 AS est_jaccard
       |  FROM cand c
       |  JOIN sig s1 ON s1.doc_id = c.doc_id_1
       |  JOIN sig s2 ON s2.doc_id = c.doc_id_2)""".stripMargin
  }

  private val minhashOracle: String =
    s"""WITH ${minhashCtes(hashedShingleCtes)}
       |SELECT doc_id_1, doc_id_2, lang, est_jaccard
       |FROM est WHERE est_jaccard >= 0.5""".stripMargin

  /** DuckDB twin of [[dedupMinhashEval]] — the shared minhash CTE chain
    * for the candidate side, plus the exact-Jaccard truth from the same
    * `sh` distinct-shingle CTE.
    */
  private val minhashEvalOracle: String =
    s"""WITH ${minhashCtes(hashedShingleCtes)},
       |szs AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
       |it AS (
       |  SELECT q.lang, LEAST(q.doc_id, c.doc_id) AS doc_id_1,
       |         GREATEST(q.doc_id, c.doc_id) AS doc_id_2,
       |         COUNT(*) AS inter
       |  FROM hx q JOIN hx c
       |    ON c.lang = q.lang AND c.shingle = q.shingle
       |   AND q.doc_id != c.doc_id
       |  WHERE q.doc_id % 5 = 0
       |    AND (c.doc_id % 5 != 0 OR q.doc_id < c.doc_id)
       |  GROUP BY 1, 2, 3),
       |truth AS (
       |  SELECT it.lang, doc_id_1, doc_id_2
       |  FROM it
       |  JOIN szs s1 ON s1.doc_id = it.doc_id_1
       |  JOIN szs s2 ON s2.doc_id = it.doc_id_2
       |  WHERE 3 * inter >= s1.n_sh + s2.n_sh),
       |cnd AS (
       |  SELECT lang, doc_id_1, doc_id_2 FROM est
       |  WHERE est_jaccard >= 0.5
       |    AND (doc_id_1 % 5 = 0 OR doc_id_2 % 5 = 0)),
       |grid AS (
       |  SELECT DISTINCT lang FROM documents WHERE doc_id % 5 = 0),
       |tl AS (SELECT lang, COUNT(*) AS truth_pairs FROM truth GROUP BY 1),
       |cl AS (SELECT lang, COUNT(*) AS cand_pairs FROM cnd GROUP BY 1),
       |hl AS (
       |  SELECT t.lang, COUNT(*) AS hits
       |  FROM truth t JOIN cnd c
       |    ON c.lang = t.lang AND c.doc_id_1 = t.doc_id_1
       |   AND c.doc_id_2 = t.doc_id_2
       |  GROUP BY 1),
       |g AS (
       |  SELECT grid.lang,
       |         CAST(COALESCE(truth_pairs, 0) AS BIGINT) AS truth_pairs,
       |         CAST(COALESCE(cand_pairs, 0) AS BIGINT) AS cand_pairs
       |  FROM grid
       |  LEFT JOIN tl ON tl.lang = grid.lang
       |  LEFT JOIN cl ON cl.lang = grid.lang)
       |SELECT g.lang, g.truth_pairs, g.cand_pairs,
       |       CAST(COALESCE(hl.hits, 0) AS BIGINT) AS hits,
       |       CASE WHEN g.cand_pairs > 0
       |            THEN CAST(COALESCE(hl.hits, 0) * 1000000 // g.cand_pairs AS BIGINT)
       |            ELSE 1000000 END AS precision_ppm,
       |       CASE WHEN g.truth_pairs > 0
       |            THEN CAST(COALESCE(hl.hits, 0) * 1000000 // g.truth_pairs AS BIGINT)
       |            ELSE 1000000 END AS recall_ppm
       |FROM g LEFT JOIN hl ON hl.lang = g.lang""".stripMargin

  /** DuckDB twin of [[dedupBandCurve]]: shared shingle/signature/truth
    * CTEs, then one collide→verify→count block PER banding config (emitted
    * by the same [[BandConfigs]]/[[BandCoef]] loop as the Spark plan — one
    * source of truth for the coefficients).
    */
  private val bandCurveOracle: String = {
    val sigCols = (0 until MinhashK).map(i =>
      s"MIN((x * ${2 * i + 1} + ${i * 12345 + 7}) % 2147483647) AS sig_$i")
      .mkString(",\n         ")
    val matchTerms = (0 until MinhashK).map(i =>
      s"(CASE WHEN s1.sig_$i = s2.sig_$i THEN 1 ELSE 0 END)").mkString(" + ")
    val perConfig = BandConfigs.map { case (b, r) =>
      val bandCases = (0 until b).map { j =>
        val combine = (0 until r)
          .map(t => s"sig_${r * j + t} * ${BandCoef(t)}").mkString(" + ")
        s"WHEN $j THEN ($combine) % 2147483647"
      }.mkString("\n           ")
      s"""bands_${b} AS (
         |  SELECT doc_id, lang, b.band_idx,
         |         CASE b.band_idx
         |           $bandCases
         |         END AS band_hash
         |  FROM sig CROSS JOIN (SELECT UNNEST(range(0, $b)) AS band_idx) b),
         |cand_${b} AS (
         |  SELECT DISTINCT a.lang, a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
         |  FROM bands_${b} a JOIN bands_${b} b
         |    ON a.lang = b.lang AND a.band_idx = b.band_idx
         |   AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
         |  WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0),
         |flag_${b} AS (
         |  SELECT c.lang,
         |         CASE WHEN $matchTerms >= 8 THEN 1 ELSE 0 END AS kept,
         |         CASE WHEN $matchTerms >= 8 AND t.doc_id_1 IS NOT NULL
         |              THEN 1 ELSE 0 END AS hit
         |  FROM cand_${b} c
         |  JOIN sig s1 ON s1.doc_id = c.doc_id_1
         |  JOIN sig s2 ON s2.doc_id = c.doc_id_2
         |  LEFT JOIN truth t ON t.lang = c.lang
         |   AND t.doc_id_1 = c.doc_id_1 AND t.doc_id_2 = c.doc_id_2),
         |stats_${b} AS (
         |  SELECT $b AS bands, $r AS rows_per_band, lang,
         |         COUNT(*) AS raw_pairs, SUM(kept) AS kept_pairs,
         |         SUM(hit) AS hits
         |  FROM flag_${b} GROUP BY lang)""".stripMargin
    }.mkString(",\n")
    val unions = BandConfigs.map { case (b, _) => s"SELECT * FROM stats_${b}" }
      .mkString(" UNION ALL ")
    s"""WITH $hashedShingleCtes,
       |sig AS (
       |  SELECT doc_id, lang,
       |         $sigCols
       |  FROM xs GROUP BY doc_id, lang),
       |szs AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
       |it AS (
       |  SELECT q.lang, LEAST(q.doc_id, c.doc_id) AS doc_id_1,
       |         GREATEST(q.doc_id, c.doc_id) AS doc_id_2,
       |         COUNT(*) AS inter
       |  FROM hx q JOIN hx c
       |    ON c.lang = q.lang AND c.shingle = q.shingle
       |   AND q.doc_id != c.doc_id
       |  WHERE q.doc_id % 5 = 0
       |    AND (c.doc_id % 5 != 0 OR q.doc_id < c.doc_id)
       |  GROUP BY 1, 2, 3),
       |truth AS (
       |  SELECT it.lang, doc_id_1, doc_id_2
       |  FROM it
       |  JOIN szs s1 ON s1.doc_id = it.doc_id_1
       |  JOIN szs s2 ON s2.doc_id = it.doc_id_2
       |  WHERE 3 * inter >= s1.n_sh + s2.n_sh),
       |tl AS (SELECT lang, COUNT(*) AS truth_pairs FROM truth GROUP BY 1),
       |$perConfig,
       |per_config AS ($unions),
       |grid AS (
       |  SELECT d.lang, c.bands, c.rows_per_band
       |  FROM (SELECT DISTINCT lang FROM documents WHERE doc_id % 5 = 0) d
       |  CROSS JOIN (VALUES ${BandConfigs.map { case (b, r) => s"($b, $r)" }
        .mkString(", ")}) c(bands, rows_per_band))
       |SELECT CAST(g.bands AS BIGINT) AS bands,
       |       CAST(g.rows_per_band AS BIGINT) AS rows_per_band, g.lang,
       |       CAST(COALESCE(tl.truth_pairs, 0) AS BIGINT) AS truth_pairs,
       |       CAST(COALESCE(p.raw_pairs, 0) AS BIGINT) AS raw_pairs,
       |       CAST(COALESCE(p.kept_pairs, 0) AS BIGINT) AS kept_pairs,
       |       CAST(COALESCE(p.hits, 0) AS BIGINT) AS hits,
       |       CASE WHEN COALESCE(p.kept_pairs, 0) > 0
       |            THEN CAST(COALESCE(p.hits, 0) * 1000000
       |                      // p.kept_pairs AS BIGINT)
       |            ELSE 1000000 END AS precision_ppm,
       |       CASE WHEN COALESCE(tl.truth_pairs, 0) > 0
       |            THEN CAST(COALESCE(p.hits, 0) * 1000000
       |                      // tl.truth_pairs AS BIGINT)
       |            ELSE 1000000 END AS recall_ppm
       |FROM grid g
       |LEFT JOIN tl ON tl.lang = g.lang
       |LEFT JOIN per_config p ON p.lang = g.lang AND p.bands = g.bands
       |  AND p.rows_per_band = g.rows_per_band""".stripMargin
  }

  /** `dedup_cross_source`: the near-dup PROVENANCE matrix — which sources
    * duplicate which: every confirmed minhash-LSH pair joined to its two
    * docs' sources, pair-canonicalized (least/greatest) so direction
    * doesn't split cells, rolled up to (source_a, source_b) with the count
    * and mean estimated Jaccard. The diagonal is within-source duplication
    * (crawl echo); hot off-diagonal cells are mirror/scrape relationships —
    * the report that decides which source loses its copies in
    * `dedup_keep_best`. Cost on top of the LSH pass: two doc_id-keyed
    * joins against a 2-column projection and a source²-sized rollup. The
    * mean is order-independent despite double summation: est_jaccard is
    * k-quantized to sixteenths, exactly representable, so partial sums
    * never round.
    */
  def dedupCrossSource(documents: DataFrame): DataFrame = {
    val src = documents.select(col("doc_id"), col("source"))
    dedupMinhashLsh(documents)
      .join(src.select(col("doc_id").as("doc_id_1"), col("source").as("src_1")), Seq("doc_id_1"))
      .join(src.select(col("doc_id").as("doc_id_2"), col("source").as("src_2")), Seq("doc_id_2"))
      .select(least(col("src_1"), col("src_2")).as("source_a"),
        greatest(col("src_1"), col("src_2")).as("source_b"),
        col("est_jaccard"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum(col("est_jaccard")) / count(lit(1)).cast(DoubleType)).as("avg_jaccard"))
  }

  private val crossSourceOracle: String =
    s"""WITH ${minhashCtes(hashedShingleCtes)},
       |pairs AS (
       |  SELECT doc_id_1, doc_id_2, est_jaccard FROM est WHERE est_jaccard >= 0.5),
       |j AS (
       |  SELECT LEAST(d1.source, d2.source) AS source_a,
       |         GREATEST(d1.source, d2.source) AS source_b,
       |         p.est_jaccard
       |  FROM pairs p
       |  JOIN documents d1 ON d1.doc_id = p.doc_id_1
       |  JOIN documents d2 ON d2.doc_id = p.doc_id_2)
       |SELECT source_a, source_b, COUNT(*) AS n_pairs,
       |       SUM(est_jaccard) / CAST(COUNT(*) AS DOUBLE) AS avg_jaccard
       |FROM j GROUP BY 1, 2""".stripMargin

  /** Paragraph-span oracle: the paragraph CTE mirrors [[paragraphs]] (same
    * window/cap/packed span id), then the shared minhash CTEs run over it.
    */
  private val paragraphOracle: String = {
    val w = ParaWindow
    val m = MaxParas
    val paraCte =
      s"""paras AS (
         |  SELECT doc_id * $m + pi AS doc_id, lang,
         |         array_to_string(tokens[pi * $w + 1 : pi * $w + $w], ' ') AS text
         |  FROM (
         |    SELECT doc_id, lang, tokens,
         |           UNNEST(range(0, LEAST(CAST(CEIL(len(tokens) / $w.0) AS BIGINT), $m))) AS pi
         |    FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS tokens
         |          FROM documents)))""".stripMargin
    s"""WITH $paraCte,
       |${minhashCtes(hashedShingleCtesFrom("paras"))}
       |SELECT CAST(doc_id_1 // $m AS BIGINT) AS doc_a,
       |       CAST(doc_id_1 % $m AS BIGINT) AS para_a,
       |       CAST(doc_id_2 // $m AS BIGINT) AS doc_b,
       |       CAST(doc_id_2 % $m AS BIGINT) AS para_b,
       |       lang, est_jaccard
       |FROM est
       |WHERE est_jaccard >= 0.5 AND doc_id_1 // $m != doc_id_2 // $m""".stripMargin
  }

  private val simhashOracle: String = {
    val bitTerms = (0 until 16).map(b =>
      s"(CASE WHEN SUM(CASE WHEN (x >> $b) % 2 = 1 THEN 1 ELSE -1 END) >= 0 " +
        s"THEN CAST(1 AS BIGINT) << $b ELSE 0 END)").mkString("\n         + ")
    s"""WITH $hashedShingleCtes,
       |sig AS (
       |  SELECT doc_id, lang,
       |         $bitTerms AS simhash
       |  FROM (SELECT doc_id, lang, x % 65536 AS x FROM xs)
       |  GROUP BY doc_id, lang),
       |banded AS (
       |  SELECT doc_id, lang, simhash, nib.nib_idx,
       |         (simhash >> CAST(nib.nib_idx * 4 AS INT)) % 16 AS nib_val
       |  FROM sig CROSS JOIN (SELECT UNNEST(range(0, 4)) AS nib_idx) nib),
       |cand AS (
       |  SELECT DISTINCT a.lang, a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       |         a.simhash AS h1, b.simhash AS h2
       |  FROM banded a JOIN banded b
       |    ON a.lang = b.lang AND a.nib_idx = b.nib_idx
       |   AND a.nib_val = b.nib_val AND a.doc_id < b.doc_id)
       |SELECT doc_id_1, doc_id_2, lang,
       |       CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(h1, h2)) <= 3""".stripMargin
  }

  /** `dedup_clusters`: canonical near-dup CLUSTER assignment — the step a
    * curation pipeline actually needs after pairwise detection (keep one doc
    * per cluster, not per pair). Connected components over the minhash-LSH
    * candidate pairs via min-label propagation WITH pointer jumping: each
    * round a node adopts min(its label, its neighbors' labels, the label of
    * its label). The label-of-label shortcut doubles the propagation
    * distance per round, so convergence is O(log diameter) — a diameter-2^20
    * chain resolves in ~20 rounds, where plain one-hop propagation (the
    * round-2 implementation) needed diameter rounds and could silently exit
    * at maxIters with labels that were not yet the component minimum.
    * Non-convergence now throws instead of returning wrong clusters.
    * Cluster id = smallest doc_id in the component — deterministic and
    * partitioning-independent, so the DuckDB recursive-CTE oracle reaches
    * the identical fixpoint.
    *
    * Scale: each round is two shuffle joins keyed by doc id over the sparse
    * candidate subgraph (edges are LSH candidates, NOT all pairs); only the
    * per-round change count touches the driver. Docs with no candidate edge
    * are singletons by definition and are excluded — at 100 TB the iterated
    * state stays proportional to the near-dup subgraph. The returned frame
    * is localCheckpoint-materialized so every loop cache can be unpersisted
    * before returning (no leaked cache entries for library callers).
    */
  def dedupClusters(documents: DataFrame, maxIters: Int = 20): DataFrame = {
    val spark = documents.sparkSession
    // the iterated state is the sparse candidate subgraph (hundreds of rows
    // per million docs), so run the loop at a partition count sized to it —
    // session-level 32-partition shuffles would pay ~10x task overhead per
    // iteration for no parallelism gain (restored after; at real scale size
    // this to the subgraph, not the corpus)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      // Lineage discipline — the core of making ANY iterative DataFrame
      // algorithm viable: every iterate is `localCheckpoint(eager=true)`'d,
      // which materializes it AND replaces its logical plan with a leaf.
      // Without this the round-k plan embeds the round-(k-1) plan once per
      // reference (3x here), so the LOGICAL TREE grows ~6x per round even
      // though cached data backs every leaf — measured at sf0.1: a 60 MB
      // plan string by round 3, with analysis/optimization (not data!)
      // costing seconds per round and dominating the query.
      // Cluster caveat: localCheckpoint truncates lineage, so a lost
      // executor cannot recompute its blocks — on a real cluster set
      // `spark.sparkContext.setCheckpointDir` and
      // `spark.graft.checkpoint.reliable=true` so Iterate.materialize swaps
      // in reliable `.checkpoint()` (same plan-truncation effect, file-
      // backed blocks; CheckpointRecoverySpec pins the recovery contract);
      // local[*] has no executor loss, so the cheap variant is correct here.
      val edges = dedupMinhashLsh(documents)
        .select(col("doc_id_1"), col("doc_id_2")).cache()
      // one evaluation of the LSH pipeline, then a leaf
      val sym = Iterate.materialize(edges.union(
        edges.select(col("doc_id_2").as("doc_id_1"), col("doc_id_1").as("doc_id_2"))))
      edges.unpersist()
      var labels = Iterate.materialize(sym.select(col("doc_id_1").as("node")).distinct()
        .withColumn("label", col("node")))
      var converged = false
      var iter = 0
      while (!converged && iter < maxIters) {
        val nbrMin = sym
          .join(labels.select(col("node").as("doc_id_2"), col("label")), Seq("doc_id_2"))
          .groupBy(col("doc_id_1").as("node"))
          .agg(min(col("label")).as("nbr_label"))
        val oneHop = labels
          .join(nbrMin, Seq("node"), "left")
          .select(col("node"), col("label").as("old_label"),
            least(col("label"), coalesce(col("nbr_label"), col("label"))).as("cand"))
        // pointer jump: labels are themselves node ids of this subgraph, so
        // look up the candidate label's OWN label and adopt it (l(x) <= x
        // always — labels only decrease). This is what turns O(diameter)
        // into O(log diameter). Skipped on the first round, where labels are
        // still the identity and the lookup could only return cand itself.
        val jumped =
          if (iter == 0) oneHop.select(col("node"), col("old_label"), col("cand").as("label"))
          else oneHop
            .join(labels.select(col("node").as("cand"), col("label").as("cand_label")),
              Seq("cand"), "left")
            .select(col("node"), col("old_label"),
              least(col("cand"), coalesce(col("cand_label"), col("cand"))).as("label"))
        // materialize + truncate; old_label rides along so the convergence
        // check is observed DURING the same materialization action (r17:
        // one job per round, not two — Iterate.materializeObserved)
        val (updated, changes) = Iterate.materializeObserved(jumped,
          sum(when(col("label") =!= col("old_label"), 1L).otherwise(0L)))
        if (sys.env.contains("GRAFT_CLUSTERS_DEBUG"))
          System.err.println(s"[clusters] iter=$iter changes=$changes")
        labels = updated.select(col("node"), col("label"))
        converged = changes == 0
        iter += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"dedupClusters: min-label propagation did not converge in $maxIters " +
            "pointer-jumping rounds (component diameter > 2^" + maxIters + " is " +
            "not plausible — indicates an edge-generation bug)")
      // no .cache() survives this method: intermediate checkpoint blocks are
      // released by the ContextCleaner as their RDDs go out of scope, and
      // the returned frame reads the final (tiny) checkpointed iterate
      labels
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("label")).cast("long"))
        .select(col("node").as("doc_id"), col("label").as("cluster_id"),
          col("cluster_size"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  // def, not val: references minhashOracle, which initializes later in the object
  private[operators] def clustersOracle: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_id_1, doc_id_2 FROM ($minhashOracle) mh),
       |sym AS (
       |  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
       |  UNION
       |  SELECT doc_id_2, doc_id_1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM sym
       |  UNION
       |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
       |lab AS (
       |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
       |  FROM reach GROUP BY a)
       |SELECT doc_id, cluster_id,
       |       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
       |FROM lab""".stripMargin

  /** `dedup_embedding_lsh`: the 100-TB blocking for embedding near-dup —
    * pairs compared only inside hyperplane buckets ([[Similarity.bucketCol]])
    * instead of inside `label` blocks, so the quadratic work is bounded by
    * the largest BUCKET (expected N/256), not by an externally supplied
    * label. At scale the corpus is written `partitionBy(bucket)`, making
    * each bucket's self-join a partition-local operation. The label-blocked
    * [[dedupEmbeddingCosine]] stays as the exact-baseline query; DedupSpec
    * measures this variant's recall against an unblocked all-pairs truth.
    */
  def dedupEmbeddingLsh(embeddings: DataFrame): DataFrame = {
    val q = quantized(embeddings)
      .withColumn("norm2", long_dot(col("q"), col("q")))
      .withColumn("bucket", Similarity.bucketCol)
    val a = q.select(col("bucket"), col("vec_id").as("vec_id_1"),
      col("q").as("q1"), col("norm2").as("n1"))
    val b = q.select(col("bucket"), col("vec_id").as("vec_id_2"),
      col("q").as("q2"), col("norm2").as("n2"))
    a.join(b, Seq("bucket"))
      .where(col("vec_id_1") < col("vec_id_2"))
      .withColumn("cosine", cosine(long_dot(col("q1"), col("q2")), col("n1"), col("n2")))
      .where(col("cosine") >= 0.95)
      .select(col("vec_id_1"), col("vec_id_2"), col("bucket"), col("cosine"))
  }

  /** `dedup_embedding_lsh_wide`: the corpus-scale banding of
    * [[dedupEmbeddingLsh]]. The 8-bit single-table form is the oracled
    * baseline, but its 256 fixed buckets make candidate volume n²/2⁸ — the
    * x100 scale point measured it 15.4× cpu for 10× data (docs/SCALE.md),
    * the same quadratic-knee class as the simhash banding ladder. This form
    * bands `bands` independent tables of `bandBits` sign bits
    * (default 4 × 16): candidates ~ n²·bands/2^bandBits — 64× fewer at the
    * defaults — while UNION-of-tables collision raises recall over any
    * single table (1−(1−p¹⁶)⁴ > p⁸ for per-plane agreement p > ~0.8, i.e.
    * every near-dup regime this operator targets). A pair colliding in
    * several bands is deduplicated AFTER the per-collision cosine (narrow
    * distinct on ids+cosine, the minhash-LSH discipline) so the wide arrays
    * never shuffle twice.
    */
  /** Default wide-banding geometry — `dedupEmbeddingLshWide` and its oracle
    * both derive from these, so a retuning cannot silently diverge the two.
    */
  private[operators] val WideBandBits = 16
  private[operators] val WideBands = 4

  def dedupEmbeddingLshWide(embeddings: DataFrame,
      bandBits: Int = WideBandBits, bands: Int = WideBands): DataFrame = {
    val q = quantized(embeddings)
      .withColumn("norm2", long_dot(col("q"), col("q")))
      .select(col("vec_id"), col("q"), col("norm2"),
        posexplode(Similarity.bandBucketsCol(bandBits, bands)).as(Seq("band", "bucket")))
    val a = q.select(col("band"), col("bucket"), col("vec_id").as("vec_id_1"),
      col("q").as("q1"), col("norm2").as("n1"))
    val b = q.select(col("band"), col("bucket"), col("vec_id").as("vec_id_2"),
      col("q").as("q2"), col("norm2").as("n2"))
    a.join(b, Seq("band", "bucket"))
      .where(col("vec_id_1") < col("vec_id_2"))
      .withColumn("cosine", cosine(long_dot(col("q1"), col("q2")), col("n1"), col("n2")))
      .where(col("cosine") >= 0.95)
      .select(col("vec_id_1"), col("vec_id_2"), col("cosine"))
      .distinct()
  }

  /** `dedup_embedding_lsh_auto`: [[dedupEmbeddingLshWide]] with the band
    * geometry sized from the CORPUS instead of fixed constants. Fixed
    * 16-bit bands have a quadratic tail: expected candidate pairs are
    * n²·bands/2^bits, so holding bits constant while n grows K× grows
    * within-bucket work K² — measured at x1000 (17 GB, docs/SCALE.md
    * § "x1000 dedup"): the fixed-16-bit form reads ~8.8× cpu for 3.3×
    * vectors. Constant expected bucket OCCUPANCY (n/2^bits ≈ 8) keeps
    * candidate volume ∝ n·bands·occupancy — linear by construction:
    * bits = clamp(⌈log2(n/8)⌉, 8, 21), bands = min(4, 64/bits) (the
    * signature packs one 64-bit long — Similarity.bandBucketsCol). The
    * recall tradeoff is explicit and slow: candidate recall for per-plane
    * agreement p is 1−(1−p^bits)^bands (standard LSH banding analysis,
    * e.g. Leskovec/Rajaraman/Ullman MMDS ch.3), so each +1 bit multiplies
    * per-band recall by p ≈ 0.9 at the 0.95-cosine frontier while halving
    * cost; production retunes occupancy per corpus rather than letting
    * cost grow quadratically. The oracle computes the SAME geometry from
    * COUNT(*) in SQL, so the adaptive path is hash-verified end-to-end,
    * not just the formula.
    */
  /** `decontaminate_semantic`: EMBEDDING-space benchmark decontamination —
    * the paraphrase-robust complement of the n-gram `contamination_check`
    * (a reworded eval item shares no 13-gram with the benchmark but sits
    * at cosine ≈ 1 in embedding space; public eval-hygiene recipes run
    * both). A corpus vector is contaminated when ANY benchmark vector is
    * ≥ 0.95-cosine similar; output is the flagged corpus vector with its
    * hit count and worst similarity — the drop list a decontamination
    * stage anti-joins on.
    *
    * Shape = the asymmetric `dedup_incremental` probe in embedding space:
    * BOTH sides band through [[dedupEmbeddingLshWide]]'s 4 × 16-bit
    * geometry, the benchmark side (eval sets are small — thousands, not
    * billions) broadcasts, and candidates are benchmark-collision-bounded,
    * never corpus². The fixture benchmark is [[plantNearDupes]]' planted
    * companion set, which guarantees cross-split near-dup pairs — the
    * non-vacuity discipline (a random benchmark slice would assert 0 = 0).
    */
  def decontaminateSemantic(embeddings: DataFrame): DataFrame = {
    val planted = plantNearDupes(embeddings)
    decontaminateAgainst(planted.where(col("vec_id") < 10000000L),
      planted.where(col("vec_id") >= 10000000L))
  }

  /** The production surface under [[decontaminateSemantic]]: flag every
    * `corpus` vector that sits ≥ 0.95-cosine to ANY `bench` vector (both
    * sides: `vec_id`, `label`, `embedding`). The benchmark side is
    * broadcast BY CONTRACT — an eval suite is model-sized (thousands of
    * items) and stays that size while the corpus grows, so the plan is a
    * scan-resident broadcast hash probe per corpus row: linear in the
    * corpus, zero corpus-side shuffle, at any scale. A caller whose
    * "benchmark" grows with the corpus is doing near-dup dedup, not
    * decontamination — that's [[dedupEmbeddingLshAuto]]'s job (banded
    * self-join, adaptive geometry). The registered demo binds `bench` to
    * [[plantNearDupes]]' companion set (the only rows above the fixture's
    * 0.95 frontier — non-vacuity), which GROWS with the fixture (N/29):
    * fine at oracle scales, but scale measurements of the production
    * path must hold the bench fixed (docs/SCALE.md round 17).
    */
  def decontaminateAgainst(corpus: DataFrame, bench: DataFrame): DataFrame = {
    def banded(df: DataFrame): DataFrame = quantized(df)
      .withColumn("norm2", long_dot(col("q"), col("q")))
      .select(col("vec_id"), col("q"), col("norm2"),
        posexplode(Similarity.bandBucketsCol(WideBandBits, WideBands))
          .as(Seq("band", "bucket")))
    banded(corpus)
      .join(broadcast(banded(bench)
        .select(col("band"), col("bucket"), col("vec_id").as("bench_id"),
          col("q").as("qb"), col("norm2").as("nb"))), Seq("band", "bucket"))
      .withColumn("cosine",
        cosine(long_dot(col("q"), col("qb")), col("norm2"), col("nb")))
      .where(col("cosine") >= 0.95)
      .select(col("vec_id"), col("bench_id"), col("cosine"))
      .distinct()
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_benchmark_hits"), max(col("cosine")).as("max_cosine"))
  }

  def dedupEmbeddingLshAuto(embeddings: DataFrame): DataFrame = {
    // occupancy is the fixed [[AutoOccupancy]] constant, not a parameter:
    // the oracle SQL hardcodes the same value, and a tunable the oracle
    // can't see would silently un-verify every non-default call (callers
    // wanting custom geometry use dedupEmbeddingLshWide directly).
    //
    // The sizing count is a DEDICATED narrow scan on purpose — measured,
    // not assumed (x1000 interleaved A/B, docs/SCALE.md § "lsh_auto
    // staging lesson"): routing the corpus through CacheScope so the
    // count doubles as a cache fill COSTS MORE — the wide self-join's
    // two banded legs stop canonicalizing onto one exchange
    // (AQE reuse: 1.67 GB shuffled once → 3.48 GB twice, +55% cpu),
    // while the count itself is nearly free against raw parquet (4 cpu-s
    // at 17 GB — row counts come from footer metadata, no column IO).
    // Production substitutes table-manifest row counts for the job.
    val bits = autoBandBits(embeddings.count(), AutoOccupancy)
    dedupEmbeddingLshWide(embeddings, bits, autoBands(bits))
  }

  private[operators] val AutoOccupancy = 8
  private[graft] def autoBandBits(n: Long, targetOccupancy: Int): Int =
    math.max(8, math.min(21, math.ceil(
      math.log(math.max(1.0, n.toDouble / targetOccupancy)) / math.log(2.0)).toInt))
  private[graft] def autoBands(bits: Int): Int = math.min(4, 64 / bits)

  // the SAME geometry formulas in SQL (bits from COUNT(*), bands from
  // bits), so the oracle tracks the operator under any corpus size
  private val embeddingLshAutoOracle: String =
    s"""WITH $plantedCte,
       |${Similarity.quantCteFrom("emb_planted")},
       |params AS (
       |  SELECT bits, LEAST(4, 64 // bits) AS bands FROM (
       |    SELECT GREATEST(8, LEAST(21, CAST(CEIL(LOG2(GREATEST(
       |      CAST(COUNT(*) AS DOUBLE) / $AutoOccupancy, 1.0))) AS INTEGER))) AS bits
       |    FROM n)),
       |planes AS (
       |  SELECT j, list_transform(range(0, 64), d ->
       |    (j * 131 + d * 37) % 19 - 9 + ((j * 67 + d * 29) % 17 - 8) * 19) AS plane
       |  FROM range(0, 84) t(j), params WHERE j < bands * bits),
       |sb AS (
       |  SELECT n.vec_id, n.q, n.norm2, p.j,
       |         CASE WHEN list_sum(list_transform(list_zip(n.q, p.plane),
       |                z -> z[1] * z[2])) >= 0 THEN 1 ELSE 0 END AS s
       |  FROM n CROSS JOIN planes p),
       |bucketed AS (
       |  SELECT vec_id, q, norm2, j // bits AS band,
       |         CAST(SUM(CASE WHEN s = 1 THEN 1 << CAST(j % bits AS INTEGER)
       |                  ELSE 0 END) AS BIGINT) AS bucket
       |  FROM sb, params GROUP BY vec_id, q, norm2, j // bits),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       |         CAST(list_sum(list_transform(list_zip(a.q, b.q), z -> z[1] * z[2])) AS DOUBLE)
       |           / (SQRT(CAST(a.norm2 AS DOUBLE)) * SQRT(CAST(b.norm2 AS DOUBLE))) AS cosine
       |  FROM bucketed a JOIN bucketed b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT vec_id_1, vec_id_2, cosine FROM pairs WHERE cosine >= 0.95""".stripMargin

  // parameterized by the SAME constants as dedupEmbeddingLshWide's defaults
  private val embeddingLshWideOracle: String =
    s"""WITH $plantedCte,
       |${Similarity.quantCteFrom("emb_planted")},
       |planes AS (
       |  SELECT j, list_transform(range(0, 64), d ->
       |    (j * 131 + d * 37) % 19 - 9 + ((j * 67 + d * 29) % 17 - 8) * 19) AS plane
       |  FROM range(0, ${WideBands * WideBandBits}) t(j)),
       |sb AS (
       |  SELECT n.vec_id, n.q, n.norm2, p.j,
       |         CASE WHEN list_sum(list_transform(list_zip(n.q, p.plane),
       |                z -> z[1] * z[2])) >= 0 THEN 1 ELSE 0 END AS s
       |  FROM n CROSS JOIN planes p),
       |bucketed AS (
       |  SELECT vec_id, q, norm2, j // $WideBandBits AS band,
       |         CAST(SUM(CASE WHEN s = 1 THEN 1 << CAST(j % $WideBandBits AS INTEGER)
       |                  ELSE 0 END) AS BIGINT) AS bucket
       |  FROM sb GROUP BY vec_id, q, norm2, j // $WideBandBits),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       |         CAST(list_sum(list_transform(list_zip(a.q, b.q), z -> z[1] * z[2])) AS DOUBLE)
       |           / (SQRT(CAST(a.norm2 AS DOUBLE)) * SQRT(CAST(b.norm2 AS DOUBLE))) AS cosine
       |  FROM bucketed a JOIN bucketed b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT vec_id_1, vec_id_2, cosine FROM pairs WHERE cosine >= 0.95""".stripMargin

  private val decontamSemanticOracle: String =
    s"""WITH $plantedCte,
       |${Similarity.quantCteFrom("emb_planted")},
       |planes AS (
       |  SELECT j, list_transform(range(0, 64), d ->
       |    (j * 131 + d * 37) % 19 - 9 + ((j * 67 + d * 29) % 17 - 8) * 19) AS plane
       |  FROM range(0, ${WideBands * WideBandBits}) t(j)),
       |sb AS (
       |  SELECT n.vec_id, n.q, n.norm2, p.j,
       |         CASE WHEN list_sum(list_transform(list_zip(n.q, p.plane),
       |                z -> z[1] * z[2])) >= 0 THEN 1 ELSE 0 END AS s
       |  FROM n CROSS JOIN planes p),
       |bucketed AS (
       |  SELECT vec_id, q, norm2, j // $WideBandBits AS band,
       |         CAST(SUM(CASE WHEN s = 1 THEN 1 << CAST(j % $WideBandBits AS INTEGER)
       |                  ELSE 0 END) AS BIGINT) AS bucket
       |  FROM sb GROUP BY vec_id, q, norm2, j // $WideBandBits),
       |cand AS (
       |  SELECT DISTINCT c.vec_id, b.vec_id AS bench_id,
       |         CAST(list_sum(list_transform(list_zip(c.q, b.q), z -> z[1] * z[2])) AS DOUBLE)
       |           / (SQRT(CAST(c.norm2 AS DOUBLE)) * SQRT(CAST(b.norm2 AS DOUBLE))) AS cosine
       |  FROM bucketed c JOIN bucketed b
       |    ON c.band = b.band AND c.bucket = b.bucket
       |   AND c.vec_id < 10000000 AND b.vec_id >= 10000000)
       |SELECT vec_id, COUNT(*) AS n_benchmark_hits, MAX(cosine) AS max_cosine
       |FROM cand WHERE cosine >= 0.95 GROUP BY vec_id""".stripMargin

  private val embeddingLshOracle: String =
    s"""WITH $plantedCte,
       |${Similarity.quantCteFrom("emb_planted")},
       |planes AS (
       |  SELECT j, list_transform(range(0, 64), d -> (j * 131 + d * 37) % 19 - 9) AS plane
       |  FROM range(0, 8) t(j)),
       |bucketed AS (
       |  SELECT n.vec_id, n.q, n.norm2,
       |         CAST(SUM(CASE WHEN list_sum(list_transform(list_zip(n.q, p.plane), z -> z[1] * z[2])) >= 0
       |                  THEN 1 << CAST(p.j AS INTEGER) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM n CROSS JOIN planes p
       |  GROUP BY n.vec_id, n.q, n.norm2),
       |pairs AS (
       |  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2, a.bucket,
       |         CAST(list_sum(list_transform(list_zip(a.q, b.q), z -> z[1] * z[2])) AS DOUBLE)
       |           / (SQRT(CAST(a.norm2 AS DOUBLE)) * SQRT(CAST(b.norm2 AS DOUBLE))) AS cosine
       |  FROM bucketed a JOIN bucketed b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT vec_id_1, vec_id_2, bucket, cosine
       |FROM pairs WHERE cosine >= 0.95""".stripMargin

  /** `dedup_keep_best`: resolve every near-dup cluster to its single best
    * document — the curation decision the cluster labels exist FOR. Composes
    * three library pieces: [[dedupClusters]] (connected components over LSH
    * candidates), [[TextAnalysis.textQuality]] (the exact quality score),
    * and a keep-rank-1-per-cluster written in the row_number form so the
    * rank-limit rewrite plans it through TopKPerKey (k=1 heaps, no sort).
    * Docs with no near-dup edge are singletons and already "kept" — this
    * emits the decision for the contested clusters only.
    */
  def dedupKeepBest(documents: DataFrame): DataFrame = {
    val clusters = dedupClusters(documents)
    val quality = TextAnalysis.textQuality(documents)
      .select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality_score").desc, col("doc_id"))
    clusters.join(quality, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("kept_doc_id"),
        col("cluster_size"), col("quality_score"))
  }

  val oracles: Map[String, String] = Map(
    "dedup_keep_best" ->
      s"""WITH c AS (SELECT * FROM ($clustersOracle) cc),
         |q AS (${TextAnalysis.qualityScoreSql}),
         |j AS (
         |  SELECT c.cluster_id, c.doc_id, c.cluster_size, q.quality_score
         |  FROM c JOIN q ON c.doc_id = q.doc_id),
         |r AS (
         |  SELECT cluster_id, doc_id, cluster_size, quality_score,
         |         ROW_NUMBER() OVER (PARTITION BY cluster_id
         |           ORDER BY quality_score DESC, doc_id) AS rn
         |  FROM j)
         |SELECT cluster_id, doc_id AS kept_doc_id, cluster_size, quality_score
         |FROM r WHERE rn = 1""".stripMargin,
    "dedup_clusters" -> clustersOracle,
    "dedup_embedding_lsh" -> embeddingLshOracle,
    "dedup_embedding_lsh_wide" -> embeddingLshWideOracle,
    "decontaminate_semantic" -> decontamSemanticOracle,
    "dedup_embedding_lsh_auto" -> embeddingLshAutoOracle,
    "dedup_minhash_lsh" -> minhashOracle,
    "dedup_minhash_eval" -> minhashEvalOracle,
    "dedup_band_curve" -> bandCurveOracle,
    "dedup_cross_source" -> crossSourceOracle,
    // seeded-recall audits of the xxhash fast twins: the oracle computes
    // the identical-pair truth and asserts the pipeline recovered ALL of it
    "dedup_minhash_lsh_fast" -> recallFloorOracle,
    "dedup_simhash_fast" -> recallFloorOracle,
    "dedup_paragraph_fast" -> paragraphRecallFloorOracle,
    // the symmetric candidate set restricted to one-new-one-existing pairs,
    // reoriented (new, existing) — value-identical to the asymmetric probe
    "dedup_incremental" ->
      s"""SELECT CASE WHEN doc_id_1 % 4 = 0 THEN doc_id_1 ELSE doc_id_2 END
         |         AS new_doc_id,
         |       CASE WHEN doc_id_1 % 4 = 0 THEN doc_id_2 ELSE doc_id_1 END
         |         AS existing_doc_id,
         |       lang, est_jaccard
         |FROM ($minhashOracle) mh
         |WHERE (doc_id_1 % 4 = 0) != (doc_id_2 % 4 = 0)""".stripMargin,
    "dedup_paragraph" -> paragraphOracle,
    "dedup_substring" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len
        |  FROM documents WHERE length(text) >= 40),
        |p AS (
        |  SELECT doc_id, UNNEST(range(0, len - 40 + 1)) AS pos, text FROM d),
        |hh AS (
        |  SELECT doc_id, pos, md5(substr(text, CAST(pos + 1 AS INT), 40)) AS h
        |  FROM p),
        |fps AS (
        |  SELECT DISTINCT doc_id,
        |         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |                      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS fp
        |  FROM hh),
        |dup AS (
        |  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) >= 2),
        |pd AS (
        |  SELECT fps.doc_id, COUNT(*) AS n_dup_fingerprints
        |  FROM fps JOIN dup USING (fp) GROUP BY fps.doc_id),
        |tot AS (
        |  SELECT doc_id, COUNT(*) AS n_fingerprints FROM fps GROUP BY doc_id)
        |SELECT tot.doc_id,
        |       CAST(tot.n_fingerprints AS BIGINT) AS n_fingerprints,
        |       CAST(COALESCE(pd.n_dup_fingerprints, 0) AS BIGINT)
        |         AS n_dup_fingerprints,
        |       CAST(COALESCE(pd.n_dup_fingerprints, 0) AS DOUBLE)
        |         / CAST(tot.n_fingerprints AS DOUBLE) AS dup_fraction
        |FROM tot LEFT JOIN pd ON tot.doc_id = pd.doc_id""".stripMargin,
    "dedup_simhash" -> simhashOracle,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash,
        |       MIN(doc_id) AS keeper_doc_id,
        |       COUNT(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_exact_normalized" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
        |         '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS content_hash,
        |       MIN(doc_id) AS keeper_doc_id,
        |       COUNT(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, n_chars // 100 AS len_bucket,
        |         string_split(lower(text), ' ') AS tokens
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, lang, len_bucket,
        |         list_distinct(list_transform(
        |           range(1, greatest(len(tokens) - 1, 1)),
        |           i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingles
        |  FROM toks),
        |pairs AS (
        |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, a.lang,
        |         CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS inter,
        |         CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS BIGINT) AS uni
        |  FROM sh a JOIN sh b
        |    ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id)
        |SELECT doc_id_1, doc_id_2, lang,
        |       CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
        |FROM pairs
        |WHERE uni > 0 AND CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= 0.3""".stripMargin,
    "dedup_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(lower(text), ' ') AS tokens
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_transform(
        |           range(1, greatest(len(tokens) - 1, 1)),
        |           i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS shingles
        |  FROM toks),
        |inv0 AS (SELECT doc_id, lang, UNNEST(shingles) AS shingle FROM sh),
        |rare AS (
        |  SELECT lang, shingle FROM inv0 GROUP BY 1, 2 HAVING COUNT(*) <= 50),
        |inv AS (
        |  SELECT i.doc_id, i.lang, i.shingle
        |  FROM inv0 i JOIN rare r ON i.lang = r.lang AND i.shingle = r.shingle),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM inv GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
        |         COUNT(*) AS inter
        |  FROM inv a JOIN inv b
        |    ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i.contained_id, i.container_id,
        |       CAST(i.inter AS DOUBLE) / CAST(s.sz AS DOUBLE) AS containment
        |FROM inter i JOIN sizes s ON s.doc_id = i.contained_id
        |WHERE CAST(i.inter AS DOUBLE) / CAST(s.sz AS DOUBLE) >= 0.5""".stripMargin,
    "dedup_embedding_cosine" ->
      s"""WITH $plantedCte,
        |${Similarity.quantCteFrom("emb_planted")},
        |pairs AS (
        |  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2, a.label,
        |         list_sum(list_transform(list_zip(a.q, b.q), p -> p[1] * p[2])) AS dot,
        |         a.norm2 AS n1, b.norm2 AS n2
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_id_1, vec_id_2, label,
        |       CAST(dot AS DOUBLE) / (SQRT(CAST(n1 AS DOUBLE)) * SQRT(CAST(n2 AS DOUBLE))) AS cosine
        |FROM pairs
        |WHERE CAST(dot AS DOUBLE) / (SQRT(CAST(n1 AS DOUBLE)) * SQRT(CAST(n2 AS DOUBLE))) >= 0.95""".stripMargin
  )
}
