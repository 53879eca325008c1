package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.LongDot.long_dot

/** Approximate-nearest-neighbor search over the embedding column (builder
  * brief extension surface).
  *
  * Baseline: brute-force cosine top-k — Q queries broadcast against N vectors,
  * one scan, no N×N blowup; exact integer dots via the LongDot codegen
  * expression keep results deterministic and oracle-able.
  *
  * Scale path: random-hyperplane LSH — 8 deterministic integer hyperplanes →
  * 8-bit bucket id; queries only compare against their bucket (expected N/256
  * of the corpus per probe). At 100 TB the bucketed corpus is written
  * partitioned by bucket id, so a probe is a partition-pruned scan, not a full
  * pass. (IVF would replace the hash with k-means centroids — same join
  * shape.)
  */
object Similarity {

  private def d(c: Column): Column = c.cast(DoubleType)

  private def cosine(dot: Column, n1: Column, n2: Column): Column =
    d(dot) / (sqrt(d(n1)) * sqrt(d(n2)))

  /** Quantized vectors + squared norm. */
  private def prep(embeddings: DataFrame): DataFrame =
    Dedup.quantized(embeddings).withColumn("norm2", long_dot(col("q"), col("q")))

  /** [[prep]] staged once per session via CacheScope (r17, guide §2.4 —
    * remove redundant passes). Every ANN operator derives the same
    * quantized+norm corpus, and the historical `cache()` +
    * `finally unpersist()` discipline (right for bounding executor storage
    * around the EAGER training collects) dropped the blocks before the
    * caller's action ran — so each ARM of a composed query (the
    * recall/MRR evals build 4-5 independent prep subtrees; their executed
    * plan scanned the embeddings parquet 16 times) and each warm
    * iteration re-scanned parquet and re-quantized. One CacheScope entry,
    * keyed on the canonicalized plan, makes every subtree that
    * canonicalizes to [[prep]] read the same materialized frame: the
    * training collects fill it, the final action reuses it. CacheScope
    * bounds the lifetime (LRU keep, session-scoped) and an external
    * `clearCache()` (Bench/Verify per-query isolation) just re-arms it,
    * so nothing persists across bench queries — every invocation still
    * computes from the parquet inputs.
    */
  private def stagedCorpus(embeddings: DataFrame): DataFrame =
    CacheScope.cached(prep(embeddings))

  /** `sim_search_bruteforce`: exact cosine top-5 neighbors for each query
    * vector (vec_id < 10) over the whole corpus.
    */
  def simSearchBruteforce(embeddings: DataFrame): DataFrame = {
    // staged: the corpus and broadcast-query sides are two subtrees of the
    // same prep — unstaged, each action quantized the corpus twice
    val corpus = stagedCorpus(embeddings)
    val queries = corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qv"), col("norm2").as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    corpus.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(long_dot(col("q"), col("qv")), col("norm2"), col("qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** Deterministic integer hyperplanes plane_j[d] = ((j*131 + d*37) mod 19) - 9,
    * precomputed host-side and embedded as `typedLit` constants — evaluated
    * once at plan time instead of re-materializing 8 x 64-element arrays per
    * row (the round-1 bench hotspot in this query).
    */
  private val Planes: Seq[Seq[Long]] =
    (0 until 8).map(j => (0 until 64).map(d => ((j * 131 + d * 37) % 19 - 9).toLong))

  /** 8-bit hyperplane bucket: sign bits of dots with the 8 planes. */
  private[operators] def bucketCol: Column =
    Planes.zipWithIndex.map { case (p, j) =>
      when(long_dot(col("q"), typedLit(p)) >= 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)

  /** Banded multi-table hyperplane buckets (the scale form of [[bucketCol]]):
    * `bands` independent tables of `bandBits` sign bits each, as an array of
    * per-band bucket values. Two residue systems (mod 19 and mod 17) mix into
    * the plane weights so all `bands*bandBits` planes are DISTINCT — the
    * single-residue [[Planes]] formula cycles with period 19 in `j`, which
    * would duplicate planes (and correlate band bits) beyond 19 planes. The
    * weights stay small integers (|w| ≤ 161), so the quantized dot is exact
    * in a Long with > 2¹⁰ headroom, and both engines reproduce it digit-for-
    * digit.
    */
  private[operators] def bandBucketsCol(bandBits: Int, bands: Int): Column = {
    require(bands * bandBits <= 64, "the signature packs into one long")
    val planes: Seq[Seq[Long]] = (0 until bands * bandBits).map(j =>
      (0 until 64).map(d =>
        ((j * 131 + d * 37) % 19 - 9 + ((j * 67 + d * 29) % 17 - 8) * 19).toLong))
    // all sign bits in ONE generated nested loop (HyperplaneSig scaladoc has
    // the measured why: a 64-plane when/long_dot projection blows the JIT
    // method threshold and runs interpreted); bands are then bit slices
    val sig = graft.functions.HyperplaneSig.hyperplane_sig(col("q"), planes)
    array((0 until bands).map { b =>
      pmod(shiftrightunsigned(sig, b * bandBits), lit(1L << bandBits))
    }: _*)
  }

  /** `sim_search_lsh`: bucketed ANN — queries compare only against corpus
    * vectors in their hyperplane bucket, plus (multi-probe) the 8 buckets at
    * hamming distance 1 — the standard recall fix for hash-boundary misses
    * without touching more than 9/256 of the bucket space. Exact cosine
    * within probed buckets, top-5. Probes explode on the tiny broadcast query
    * side only; the corpus is scanned once and each corpus vector matches at
    * most one probe per query (buckets are disjoint).
    */
  def simSearchLsh(embeddings: DataFrame, multiProbe: Boolean = true): DataFrame = {
    val corpus = stagedCorpus(embeddings).withColumn("bucket", bucketCol)
    val nProbes = if (multiProbe) 9 else 1
    val probeFlips = array((0 until nProbes).map(f =>
      lit(if (f == 0) 0L else 1L << (f - 1))): _*)
    val queries = corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qv"), col("norm2").as("qn"),
        explode(transform(probeFlips, f => col("bucket").bitwiseXOR(f))).as("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    corpus.join(broadcast(queries), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(long_dot(col("q"), col("qv")), col("norm2"), col("qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("bucket"),
        col("cosine"), col("rank").cast("long").as("rank"))
  }

  /** Exact-integer argmin cluster assignment for quantized vectors in `q`
    * against the given integer centroids (`||c||² − 2·x·c` at a common
    * scale) — deterministic across runs and partitionings. Plans as the
    * [[graft.functions.CentroidArgmin]] native expression: constant-size
    * generated code (two primitive loops over the codebook reference)
    * instead of k inlined LongDot subtrees under a k-way `least`, whose
    * janino compilation dominated sim_search_pq's wall clock.
    */
  private def clusterCol(cs: Seq[Array[Long]], qCol: String = "q"): Column =
    graft.functions.CentroidArgmin.centroid_argmin(col(qCol), cs)

  /** Mini k-means training over an already-cached prepped corpus; returns
    * the final integer centroid model (k×64 longs — the only thing that
    * touches the driver). See [[simSearchIvf]] for the exactness notes.
    */
  private def trainKmeans(corpus: DataFrame, k: Int, iters: Int,
      qCol: String = "q", dim: Int = 64): Seq[Array[Long]] = {
    // deterministic init: the k lowest-id vectors
    var cents: Seq[Array[Long]] = corpus.orderBy("vec_id").limit(k)
      .select(qCol).collect().map(_.getSeq[Long](0).toArray).toSeq
    for (_ <- 1 to iters) {
        val sums = corpus.withColumn("cluster", clusterCol(cents, qCol))
          .select(col("cluster"), posexplode(col(qCol)).as(Seq("pos", "v")))
          .groupBy(col("cluster"), col("pos"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .collect()
        val byCluster = sums.groupBy(_.getLong(0))
        cents = cents.zipWithIndex.map { case (old, cid) =>
          byCluster.get(cid.toLong) match {
            case Some(rows) =>
              val arr = Array.fill(dim)(0L)
              rows.foreach { r =>
                // exact integer round-half via TRUNCATING division (Scala /):
                // DuckDB `//` also truncates toward zero in this build
                // ((-7)//6 = -1, not floor's -2), so (2s+n)/(2n) is
                // bit-identical cross-engine for BOTH signs of the sum —
                // Math.floorDiv would diverge on negative dimension sums
                arr(r.getInt(1)) = (2 * r.getLong(2) + r.getLong(3)) / (2 * r.getLong(3))
              }
              arr
            case None => old // empty cluster keeps its centroid
          }
        }
    }
    cents
  }

  /** [[trainKmeans]] over SEVERAL subspace columns at once — identical math
    * per subspace (same lowest-id init, same assignment argmin, same
    * truncating centroid update), but ONE Spark job per step instead of one
    * per (subspace, step): the init collect fetches every subspace of the
    * k seed rows together, and each iteration stacks the per-subspace
    * (cluster, pos, v) rows behind a subspace discriminator before a single
    * shared aggregate. PQ trains m codebooks, so this turns m·(iters+1)
    * driver round-trips into iters+1 — at bench scale the job overhead WAS
    * the training cost, and on a real cluster fewer barriers is strictly
    * better. Oracle-identical by construction (the per-subspace trainings
    * never interact).
    */
  private def trainKmeansMulti(corpus: DataFrame, k: Int, iters: Int,
      qCols: Seq[String], dim: Int): Seq[Seq[Array[Long]]] = {
    val m = qCols.length
    val seed = corpus.orderBy("vec_id").limit(k)
      .select(qCols.map(col): _*).collect()
    var cents: Seq[Seq[Array[Long]]] =
      (0 until m).map(si => seed.map(_.getSeq[Long](si).toArray).toSeq)
    for (_ <- 1 to iters) {
      val stacked = corpus
        .select(explode(array((0 until m).map(si =>
          struct(lit(si).as("si"),
            clusterCol(cents(si), qCols(si)).as("cluster"),
            col(qCols(si)).as("qs"))): _*)).as("e"))
        .select(col("e.si"), col("e.cluster"), posexplode(col("e.qs")).as(Seq("pos", "v")))
        .groupBy(col("si"), col("cluster"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val bySubspace = stacked.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (subCents, si) =>
        val byCluster = bySubspace.getOrElse(si, Array.empty).groupBy(_.getLong(1))
        subCents.zipWithIndex.map { case (old, cid) =>
          byCluster.get(cid.toLong) match {
            case Some(rows) =>
              val arr = Array.fill(dim)(0L)
              rows.foreach { r =>
                arr(r.getInt(2)) = (2 * r.getLong(3) + r.getLong(4)) / (2 * r.getLong(4))
              }
              arr
            case None => old
          }
        }
      }
    }
    cents
  }

  /** `sim_search_ivf`: inverted-file ANN — the centroid-based alternative to
    * hyperplane LSH (same probe-join shape, learned partitions).
    *
    * Mini k-means on the quantized vectors: centroids are re-quantized to
    * integers each iteration, so cluster assignment is an exact integer
    * argmin (`||c||² − 2·x·c` at a common scale) via LongDot — deterministic
    * across runs and partitionings. Only the k×64 centroid model touches the
    * driver (standard IVF training); all data stays distributed. At scale the
    * corpus is written `partitionBy(cluster)` and a probe prunes to one
    * partition.
    */
  def simSearchIvf(embeddings: DataFrame, k: Int = 16, iters: Int = 2): DataFrame = {
    val corpus = stagedCorpus(embeddings)
    val cents = trainKmeans(corpus, k, iters)
    ivfProbe(corpus, cents)
  }

  /** The probe stage of [[simSearchIvf]] over an already-trained coarse
    * model — split out (r17) so the index-family evals share ONE coarse
    * training between their IVF and IVF-PQ arms (both train the identical
    * deterministic k=16 model over the same prepped corpus).
    */
  private def ivfProbe(corpus: DataFrame, cents: Seq[Array[Long]]): DataFrame = {
    {
      val bucketed = corpus.withColumn("cluster", clusterCol(cents))
      val queries = bucketed.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("q").as("qv"), col("norm2").as("qn"),
          col("cluster"))
      val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
      bucketed.join(broadcast(queries), Seq("cluster"))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("cosine", cosine(long_dot(col("q"), col("qv")), col("norm2"), col("qn")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cluster"),
          col("cosine"), col("rank").cast("long").as("rank"))
    }
  }

  /** `embed_kmeans`: the k-means cluster ASSIGNMENT as a first-class
    * operator — corpus partitioning for IVF index builds, per-cluster
    * curation quotas, or diversity sampling (pick n per cluster via
    * TopKPerKey downstream). Same deterministic integer model as
    * [[simSearchIvf]]: only the k×64 centroid sums touch the driver, the
    * assignment is one codegen'd projection over the corpus, and sizes come
    * from a broadcast of the k-row count frame — at 100 TB the corpus is
    * scanned twice (train iterations + final assign) and shuffled never.
    */
  def embedKmeans(embeddings: DataFrame, k: Int = 16, iters: Int = 2): DataFrame = {
    val corpus = stagedCorpus(embeddings)
    val cents = trainKmeans(corpus, k, iters)
    val assigned = corpus.withColumn("cluster", clusterCol(cents))
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    assigned.join(broadcast(sizes), Seq("cluster"))
      .select(col("vec_id"), col("cluster"), col("cluster_size"))
  }

  /** `dedup_semantic`: SemDeDup-style semantic deduplication (Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication" — public arXiv) in its cluster-representative form:
    * k-means over the embeddings, then ONE keeper per cluster — the vector
    * closest to its centroid (exact integer `||c||² − 2·x·c`, ties to the
    * lowest vec_id) — with the cluster size as the dedup ratio audit.
    * Everything is the deterministic integer k-means of [[embedKmeans]], so
    * the full pipeline is oracle-exact. The per-cluster argmin plans
    * through TopKPerKey via the rank-limit rewrite: no per-cluster sort,
    * bounded heaps, hot clusters capped at one row per split — the same
    * 100-TB shape as `dedup_keep_best`.
    */
  def dedupSemantic(embeddings: DataFrame, k: Int = 16, iters: Int = 2): DataFrame = {
    val corpus = stagedCorpus(embeddings)
    val cents = trainKmeans(corpus, k, iters)
    val centArr = typedLit(cents.map(_.toSeq))
    val normArr = typedLit(cents.map(c => c.map(v => v * v).sum))
    val assigned = corpus
      .withColumn("cluster", clusterCol(cents))
      .withColumn("dist",
        element_at(normArr, (col("cluster") + 1).cast("int")) -
          long_dot(col("q"), element_at(centArr, (col("cluster") + 1).cast("int"))) * 2)
    val sizes = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("cluster_size"))
    val w = Window.partitionBy("cluster").orderBy(col("dist"), col("vec_id"))
    assigned
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .join(broadcast(sizes), Seq("cluster"))
      .select(col("cluster"), col("vec_id").as("keeper_vec_id"),
        col("dist").as("keeper_dist"), col("cluster_size"))
  }

  /** `embed_pq`: product quantization — the ANN compression standard (IVF
    * selects candidates; PQ makes the residual scan cheap). The 64-dim
    * vector splits into 4 subspaces of 16 dims; each subspace trains its
    * OWN k=8 codebook with the same deterministic integer k-means as
    * [[simSearchIvf]], and a vector's code is its per-subspace argmin
    * centroid ids packed into one BIGINT — 64 floats (256 B) become one
    * 12-bit code, a ~170× compression at these demo sizes (production:
    * m=8..64 subspaces, k=256 → 8..64 bytes/vector). Asymmetric distance
    * at query time is then 4 table lookups per candidate instead of a
    * 64-dim dot product.
    *
    * Scale: each subspace's training touches the driver only through its
    * k×16 centroid model (the IVF discipline); assignment is one codegen'd
    * projection of 4×8 LongDot argmins — scan speed, no shuffle. All
    * arithmetic is the exact integer k-means, so codes are reproducible
    * cross-engine (full SQL oracle: 4 independent k-means trainings in one
    * WITH).
    */
  def embedPq(embeddings: DataFrame, m: Int = 4, k: Int = 8, iters: Int = 2): DataFrame = {
    val sub = 64 / m
    // the subspace slices are a projection over the SHARED staged corpus:
    // slicing per read is 4 array copies, far cheaper than a second
    // materialized stage (and the staged frame is what every other ANN
    // operator in a composed plan reads)
    val corpus = stagedCorpus(embeddings)
      .select(col("vec_id") +: (0 until m).map(si =>
        slice(col("q"), si * sub + 1, sub).as(s"qs_$si")): _*)
    val codebooks =
      trainKmeansMulti(corpus, k, iters, (0 until m).map(si => s"qs_$si"), sub)
    val coded = (0 until m).foldLeft(corpus: DataFrame) { case (df, si) =>
      df.withColumn(s"code_$si", clusterCol(codebooks(si), s"qs_$si"))
    }
    val codeCols = (0 until m).map(si => col(s"code_$si"))
    coded.select(
      (col("vec_id") +: codeCols :+
        codeCols.reduce((a, b) => a * k + b).as("pq_code")): _*)
  }

  /** `sim_search_pq`: asymmetric-distance (ADC) search over the
    * [[embedPq]] codes — the query side of product quantization. Each
    * query precomputes a 4×8 lookup table of exact integer subdistances
    * ||q_si − c||² to every codebook centroid; a corpus vector's distance
    * is then FOUR table lookups summed (`element_at` on the broadcast
    * LUT), never a 64-dim dot product. The corpus side of the scan touches
    * ONLY the code columns — at 100 TB the code table (12 bits/vector) is
    * what's read, not the vectors, which is the entire point of PQ. Ranks
    * are deterministic (integer adc, vec_id tiebreak) and the whole
    * pipeline — codebooks, codes, LUTs, ranking — is oracle-exact.
    */
  def simSearchPq(
      embeddings: DataFrame, m: Int = 4, k: Int = 8, topK: Int = 5): DataFrame = {
    val sub = 64 / m
    // subspace slices as a projection over the shared staged corpus — see
    // [[embedPq]]
    val corpus = stagedCorpus(embeddings)
      .select(col("vec_id") +: (0 until m).map(si =>
        slice(col("q"), si * sub + 1, sub).as(s"qs_$si")): _*)
    val codebooks =
      trainKmeansMulti(corpus, k, 2, (0 until m).map(si => s"qs_$si"), sub)
    val coded = (0 until m).foldLeft(corpus: DataFrame) { (df, si) =>
      df.withColumn(s"code_$si", clusterCol(codebooks(si), s"qs_$si"))
    }
    val queries = pqQueryLuts(corpus, codebooks, m)
    val adc = (0 until m).map(si =>
      element_at(col(s"lut_$si"), (col(s"code_$si") + 1).cast("int")))
      .reduce(_ + _)
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("vec_id"))
    coded.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("adc"), col("rank").cast("long").as("rank"))
  }

  /** Per-query ADC lookup tables, built DRIVER-side: ||q_si||² − 2·q_si·c
    * + ||c||² for each codebook centroid, exact integers (same scale as
    * the codes' argmin). Driver-side because at query time the query IS on
    * the driver (the ANN serving shape), and Q·m·k integers is model-sized
    * like the IVF centroids. This also keeps the m·k dot products OUT of
    * the generated code: as column expressions they compiled into a janino
    * unit that cost more wall-clock than the whole scan at bench scale,
    * paid again whenever the codegen cache rotates. Returns
    * (query_id, lut_0..lut_{m-1}) for the vec_id < 10 query set.
    */
  private def pqQueryLuts(
      corpus: DataFrame, codebooks: Seq[Seq[Array[Long]]], m: Int): DataFrame = {
    val queryRows = corpus.where(col("vec_id") < 10)
      .select(col("vec_id") +: (0 until m).map(si => col(s"qs_$si")): _*)
      .collect()
    val spark = corpus.sparkSession
    val lutSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        (0 until m).map(si => org.apache.spark.sql.types.StructField(s"lut_$si",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType), nullable = false)))
    val lutRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(queryRows.map { r =>
        val target = Array.concat(
          (0 until m).map(si => r.getSeq[Long](1 + si).toArray): _*)
        org.apache.spark.sql.Row.fromSeq(
          r.getLong(0) +: adcLuts(target, codebooks, m))
      }: _*)
    spark.createDataFrame(lutRows, lutSchema)
  }

  /** Exact-integer ADC lookup tables for ONE target vector against the m
    * codebooks: `luts(si)(j) = ||t_si||² − 2·t_si·c_j + ||c_j||²` — the
    * same scale the code-assignment argmin uses, so LUT ranking equals
    * exact subvector distance ranking. The single LUT routine behind both
    * [[pqQueryLuts]] (target = the query itself) and [[simSearchIvfPq]]
    * (target = the query's residual against each probed list): one
    * definition, so the two call sites cannot drift.
    */
  private def adcLuts(target: Array[Long], codebooks: Seq[Seq[Array[Long]]],
      m: Int): Seq[Seq[Long]] = {
    val sub = target.length / m
    (0 until m).map { si =>
      val ts = target.slice(si * sub, (si + 1) * sub)
      val tn = ts.map(x => x * x).sum
      codebooks(si).map { c =>
        var dot = 0L
        var i = 0
        while (i < ts.length) { dot += ts(i) * c(i); i += 1 }
        tn - 2 * dot + c.map(v => v * v).sum
      }.toSeq
    }
  }

  /** `sim_search_ivfpq`: the IVF × PQ composition — the architecture every
    * production-scale ANN index ships (FAISS `IVFPQ`, Jégou et al. 2011,
    * "Product quantization for nearest neighbor search", public): the
    * coarse full-vector k-means restricts each query's candidates to its
    * `nprobe` NEAREST inverted lists (the recall/latency knob — the scan
    * touches ~nprobe/k of the corpus; probe 1 is always the query's own
    * cluster), and within the probed lists candidates are ranked by PQ
    * asymmetric distance ([[simSearchPq]]'s shape — four LUT lookups per
    * candidate, only the code columns read, never the vectors). PQ codes
    * RESIDUALS (x − its list's coarse centroid), the refinement that makes
    * the composition accurate: every inverted list is re-centered at the
    * origin, so the shared codebooks spend their precision on the
    * within-list displacement instead of the list's absolute position.
    * Query LUTs are therefore built per (query, probed list) — the target
    * is q − c_list — still Q·nprobe·m·k integers, model-sized.
    *
    * Scale: at 100 TB the corpus is stored `partitionBy(cluster)` with
    * only (vec_id, cluster, code) in the hot table — the broadcast query
    * set prunes to the probed partitions, the ADC scan reads 12 bits per
    * candidate, and nothing shuffles (the top-k plans through TopKPerKey
    * via the rank-limit rewrite). Both stages reuse the exact integer
    * k-means, so the whole composition is oracle-exact.
    */
  /** The nprobe-INDEPENDENT part of IVF-PQ: coarse model, residual-coded
    * corpus (CacheScope-staged — training makes iters+1 passes and every
    * probe arm's join re-reads it), PQ codebooks, and the collected query
    * vectors. Split out (r17) so the nprobe tuning curve trains ONCE and
    * probes three times: the per-arm retrain reproduced bit-identical
    * deterministic models while paying the full ~7 driver round trips
    * (coarse init+2 iters, PQ init+2 iters, query collect) per arm.
    */
  private final case class IvfPqModel(coarse: Seq[Array[Long]],
      coded: DataFrame, codebooks: Seq[Seq[Array[Long]]],
      queryVecs: Array[org.apache.spark.sql.Row], m: Int)

  private def ivfPqTrain(embeddings: DataFrame, kClusters: Int, m: Int,
      k: Int, prepped: Option[DataFrame] = None,
      coarse0: Option[Seq[Array[Long]]] = None): IvfPqModel = {
    val sub = 64 / m
    val full = prepped.getOrElse(stagedCorpus(embeddings));
    {
      val coarse = coarse0.getOrElse(trainKmeans(full, kClusters, 2))
      // residual coding: r = q − c(cluster(q)), exact integers (the coarse
      // model is a driver-resident typedLit). The zip_with subtraction is
      // one interpreted projection per corpus scan — it feeds training and
      // code assignment, never the per-candidate search loop.
      val centArr = typedLit(coarse.map(_.toSeq))
      val corpus = graft.operators.CacheScope.cached(full
        .withColumn("cluster", clusterCol(coarse))
        .withColumn("r", zip_with(col("q"),
          element_at(centArr, (col("cluster") + 1).cast("int")), (a, b) => a - b))
        .select(col("vec_id") +: col("cluster") +:
          (0 until m).map(si => slice(col("r"), si * sub + 1, sub).as(s"qs_$si")): _*))
      val codebooks =
        trainKmeansMulti(corpus, k, 2, (0 until m).map(si => s"qs_$si"), sub)
      val coded = (0 until m).foldLeft(corpus: DataFrame) { (df, si) =>
        df.withColumn(s"code_$si", clusterCol(codebooks(si), s"qs_$si"))
      }
      val queryVecs = full.where(col("vec_id") < 10)
        .select(col("vec_id"), col("q")).collect()
      IvfPqModel(coarse, coded, codebooks, queryVecs, m)
    }
  }

  /** One probe arm over a trained [[IvfPqModel]]. Multi-probe (the FAISS
    * `nprobe` recall knob): each query searches its nprobe NEAREST
    * inverted lists, ranked driver-side over the driver-resident coarse
    * model by the same exact integer score (||c||² − 2·q·c) and cid
    * tiebreak the assignment argmin uses — probe 1 is therefore always the
    * query's own cluster. The ADC LUT is per (query, probed list): the
    * target is the query's residual AGAINST THAT LIST, q − c_list.
    * Q·nprobe·m·k integers, the serving shape.
    */
  private def ivfPqProbe(spark: org.apache.spark.sql.SparkSession,
      model: IvfPqModel, nprobe: Int, topK: Int): DataFrame = {
    import model._
    val lutRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(queryVecs.flatMap { r =>
        val qv = r.getSeq[Long](1).toArray
        val probed = coarse.zipWithIndex.map { case (c, cid) =>
          var dot = 0L
          var i = 0
          while (i < qv.length) { dot += qv(i) * c(i); i += 1 }
          (c.map(v => v * v).sum - 2 * dot, cid.toLong)
        }.sortBy(identity).take(nprobe)
        probed.map { case (_, cid) =>
          val cL = coarse(cid.toInt)
          val target = Array.tabulate(qv.length)(i => qv(i) - cL(i))
          org.apache.spark.sql.Row.fromSeq(
            r.getLong(0) +: cid +: adcLuts(target, codebooks, m))
        }
      }: _*)
    val lutSchema = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cluster",
          org.apache.spark.sql.types.LongType, nullable = false)) ++
        (0 until m).map(si => org.apache.spark.sql.types.StructField(s"lut_$si",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType), nullable = false)))
    val queries = spark.createDataFrame(lutRows, lutSchema)
    val adc = (0 until m).map(si =>
      element_at(col(s"lut_$si"), (col(s"code_$si") + 1).cast("int")))
      .reduce(_ + _)
    val w = Window.partitionBy("query_id").orderBy(col("adc"), col("vec_id"))
    coded.join(broadcast(queries), Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cluster"), col("adc"), col("rank").cast("long").as("rank"))
  }

  def simSearchIvfPq(embeddings: DataFrame, kClusters: Int = 16, m: Int = 4,
      k: Int = 8, topK: Int = 5, nprobe: Int = 2): DataFrame =
    ivfPqProbe(embeddings.sparkSession,
      ivfPqTrain(embeddings, kClusters, m, k), nprobe, topK)

  /** `sim_search_recall_eval`: recall@5 of every approximate index family
    * (LSH, IVF, PQ, IVF-PQ) against the exact brute-force ground truth —
    * the ann-benchmarks-style evaluation every production vector pipeline
    * runs before trusting an index, as a first-class relational operator.
    * One row per (method, query): `hits` = |approx top-5 ∩ exact top-5|,
    * `recall_ppm` the exact-integer ratio (no floats → hash-exact oracle).
    *
    * Scale protocol: ground truth is the quadratic part, so production
    * recall evaluation computes it for a SAMPLE of queries only — exactly
    * what the shared vec_id < 10 query set already is; every frame past
    * the underlying searches is (methods × sample)-sized. A query the
    * approximate index misses entirely still gets its row (hits = 0) via
    * the outer join from the method × query grid.
    */
  def simSearchRecallEval(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val exact = simSearchBruteforce(embeddings)
      .select(col("query_id"), col("neighbor_id"))
    // the IVF and IVF-PQ arms share ONE prepped corpus and ONE coarse
    // k-means (r17): both train the identical deterministic k=16 model, so
    // the historical independent builds paid the 3 training round trips
    // twice for bit-identical centroids. The corpus is the CacheScope-
    // staged [[stagedCorpus]] (not cache+unpersist), so the exact/LSH/PQ
    // arms' prep subtrees — identical canonicalized plans — read the same
    // materialized frame at action time instead of re-scanning parquet.
    val corpus = stagedCorpus(embeddings)
    val arms = {
      val coarse = trainKmeans(corpus, 16, 2)
      val model = ivfPqTrain(embeddings, 16, 4, 8,
        prepped = Some(corpus), coarse0 = Some(coarse))
      Seq(
        "lsh" -> simSearchLsh(embeddings),
        "ivf" -> ivfProbe(corpus, coarse),
        "pq" -> simSearchPq(embeddings),
        "ivfpq" -> ivfPqProbe(spark, model, nprobe = 2, topK = 5))
    }
    val approx = arms
      .map { case (m, df) =>
        df.select(lit(m).as("method"), col("query_id"), col("neighbor_id"))
      }.reduce(_ unionByName _)
    // exact is (sample × 5) rows by construction — broadcast explicitly so
    // the semi-join never shuffles the approx side on derived-frame stats
    val hit = approx
      .join(broadcast(exact), Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("method"), col("query_id")).agg(count(lit(1)).as("hits"))
    val grid = exact.select(col("query_id")).distinct()
      .crossJoin(Seq("lsh", "ivf", "pq", "ivfpq").toDF("method"))
    grid.join(broadcast(hit), Seq("method", "query_id"), "left")
      .select(col("method"), col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall_ppm", expr("hits * 1000000 div 5"))
  }

  /** `sim_search_mrr_eval`: mean reciprocal rank of every index family —
    * the ORDER-sensitive companion of [[simSearchRecallEval]] (recall@5
    * says whether the true neighbors are anywhere in the top-5; MRR says
    * whether they surface FIRST, which is what a retrieval-augmented
    * consumer that reads one passage actually experiences). Protocol:
    * relevant = the exact top-5 set, reciprocal rank = 1/rank of the first
    * relevant result in each method's ranking, 0 when none lands in the
    * top-5; emitted per method as exact integers (rr in ppm via `div`, the
    * mean as `sum div n` — floor, mirrored in the oracle). Everything past
    * the underlying searches is (methods × sample)-sized; the ground-truth
    * cost story is [[simSearchRecallEval]]'s.
    */
  def simSearchMrrEval(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val exact = simSearchBruteforce(embeddings)
      .select(col("query_id"), col("neighbor_id"))
    // shared STAGED prep + coarse model between the arms — same r17
    // rationale as simSearchRecallEval
    val corpus = stagedCorpus(embeddings)
    val arms = {
      val coarse = trainKmeans(corpus, 16, 2)
      val model = ivfPqTrain(embeddings, 16, 4, 8,
        prepped = Some(corpus), coarse0 = Some(coarse))
      Seq(
        "lsh" -> simSearchLsh(embeddings),
        "ivf" -> ivfProbe(corpus, coarse),
        "pq" -> simSearchPq(embeddings),
        "ivfpq" -> ivfPqProbe(spark, model, nprobe = 2, topK = 5))
    }
    val approx = arms
      .map { case (m, df) =>
        df.select(lit(m).as("method"), col("query_id"), col("neighbor_id"),
          col("rank"))
      }.reduce(_ unionByName _)
    val firstHit = approx
      .join(broadcast(exact), Seq("query_id", "neighbor_id"))
      .groupBy(col("method"), col("query_id"))
      .agg(min(col("rank")).as("first_rank"))
      .withColumn("rr_ppm", expr("1000000 div first_rank"))
    val grid = exact.select(col("query_id")).distinct()
      .crossJoin(Seq("lsh", "ivf", "pq", "ivfpq").toDF("method"))
    grid.join(broadcast(firstHit), Seq("method", "query_id"), "left")
      .select(col("method"), col("query_id"),
        coalesce(col("rr_ppm"), lit(0L)).as("rr_ppm"))
      .groupBy(col("method"))
      .agg(count(lit(1)).as("n_queries"), sum(col("rr_ppm")).as("sum_rr_ppm"))
      .withColumn("mrr_ppm", expr("sum_rr_ppm div n_queries"))
  }

  /** `sim_search_nprobe_curve`: recall@5 of IVF-PQ as a function of
    * `nprobe` — THE tuning curve for the serving knob
    * ([[simSearchIvfPq]]'s scaladoc: cost ≈ nprobe·N/k candidate reads):
    * an operator that answers "how many inverted lists must I probe to
    * hit my recall SLA" with a measured table instead of folklore. Same
    * protocol as [[simSearchRecallEval]] (sampled exact ground truth,
    * exact-integer recall_ppm, full nprobe × query grid). The coarse and
    * PQ models are deterministic, so the three arms share identical
    * models and differ ONLY in probing — recall is monotone
    * non-decreasing in nprobe by construction (spec-pinned).
    *
    * Reading the curve: a RISING curve means recall is probing-bound
    * (raise nprobe, pay candidate reads); a FLAT curve means the true
    * neighbors are already in the probed lists and the ADC ranking is
    * misplacing them — quantization-bound, so fix the codebook (raise m
    * or k), not nprobe. The fixture reads flat at 0.22-0.26 while plain
    * IVF reads 0.96 ([[simSearchRecallEval]]): the m=4/k=8 codebook is
    * the bottleneck — exactly the diagnosis this operator exists to
    * hand the index tuner.
    */
  def simSearchNprobeCurve(embeddings: DataFrame,
      nprobes: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val exact = simSearchBruteforce(embeddings)
      .select(col("query_id"), col("neighbor_id"))
    // ONE training for all arms (r17): the coarse/PQ models are
    // deterministic, so the historical per-arm simSearchIvfPq calls
    // reproduced bit-identical models three times over — ~7 redundant
    // driver round trips per extra arm. The arms now differ ONLY in the
    // probe stage, which is also what the curve claims to measure.
    val model = ivfPqTrain(embeddings, kClusters = 16, m = 4, k = 8)
    val approx = nprobes.map { np =>
      ivfPqProbe(spark, model, np, topK = 5)
        .select(lit(np.toLong).as("nprobe"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _)
    val hit = approx
      .join(broadcast(exact), Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("nprobe"), col("query_id")).agg(count(lit(1)).as("hits"))
    val grid = exact.select(col("query_id")).distinct()
      .crossJoin(nprobes.map(_.toLong).toDF("nprobe"))
    grid.join(broadcast(hit), Seq("nprobe", "query_id"), "left")
      .select(col("nprobe"), col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall_ppm", expr("hits * 1000000 div 5"))
  }

  /** `knn_graph`: top-k neighbor list for EVERY corpus vector — the
    * all-points sibling of [[simSearchLsh]] and the building block for
    * graph-based curation (near-dup graphs, label propagation, diversity
    * sampling). Same multi-probe hyperplane blocking: each vector probes its
    * own bucket plus the 8 hamming-1 buckets, so candidates are ~9/256 of
    * the corpus per point instead of all N. Unlike the search queries, the
    * probe side here is the full corpus, so the bucket join is a SHUFFLE
    * join keyed by bucket (never a broadcast) and the per-query top-k plans
    * through TopKPerKey via the rank-limit rewrite — no global sort, and a
    * hot bucket ships at most k rows per (query, split) to the exchange.
    * At 100 TB the corpus is written `partitionBy(bucket)`, making each
    * bucket's self-join partition-local; the quadratic term is bounded by
    * the largest bucket (expected N/256), the standard LSH trade.
    */
  /** Candidate blocking for the corpus-wide kNN operators. Every ONE-SHOT
    * fixed-parameter blocking makes candidate volume Θ(N²/B) — B is the
    * effective bucket count (the 8-bit multiprobe default: 2⁸/9 ≈ 28), so
    * the x100 slope point measured `knn_graph` at 27× cpu for 10× data,
    * exactly as N²/B predicts. That is not a bug to band away (the wide
    * 16-bit bands fix DEDUP because near-dup pairs sit at cosine ≈ 1 where
    * per-band collision stays high; mid-similarity kNN neighbors would
    * lose most of their recall). The production answer is a blocking whose
    * B GROWS with the corpus: `kmeansK = Some(k)` blocks by the
    * deterministic integer k-means cluster instead, and sizing k ∝ √N
    * makes candidate work N²/k = N^1.5 — the standard IVF scaling law,
    * measured in docs/SCALE.md (graft.Probe carries the harness). The
    * default stays the oracled multiprobe form; k-means blocking reuses
    * [[trainKmeans]]/[[clusterCol]], so its assignment is the same
    * oracle-reproducible math `embed_kmeans` ships.
    */
  private def knnBlocked(corpus: DataFrame, kmeansK: Option[Int],
      kmeansAuto: Boolean = false,
      extraProbeCols: Seq[(String, String)] = Nil): (DataFrame, DataFrame) = {
    val extra = extraProbeCols.map { case (src, dst) => col(src).as(dst) }
    (if (kmeansAuto) Some(-1) else kmeansK) match {
      case Some(k0) =>
        // staged: training makes iters+1 passes and the join reads it twice
        val cached = graft.operators.CacheScope.cached(corpus)
        // auto sizing counts the ALREADY-STAGED corpus — the count job IS
        // the cache-fill pass training pays anyway, not an extra raw scan;
        // production can substitute table-manifest row counts for the job
        val kk = if (k0 > 0) k0 else autoKmeansK(cached.count())
        val cents = trainKmeans(cached, kk, iters = 2)
        val bucketed = cached.withColumn("bucket", clusterCol(cents))
        val probes = bucketed.select(Seq(col("vec_id").as("query_id"),
          col("q").as("qv"), col("norm2").as("qn"), col("bucket")) ++ extra: _*)
        (bucketed, probes)
      case None =>
        // staged WITH the bucket column (r17): the bucket join reads the
        // corpus on both sides, and each side otherwise re-quantizes AND
        // re-evaluates the 8-plane hyperplane signature over the full
        // corpus — the per-row compute of this operator
        val bucketed =
          graft.operators.CacheScope.cached(corpus.withColumn("bucket", bucketCol))
        val probeFlips = array((0 until 9).map(f =>
          lit(if (f == 0) 0L else 1L << (f - 1))): _*)
        val probes = bucketed.select(Seq(col("vec_id").as("query_id"),
          col("q").as("qv"), col("norm2").as("qn"),
          explode(transform(probeFlips, f => col("bucket").bitwiseXOR(f))).as("bucket"))
          ++ extra: _*)
        (bucketed, probes)
    }
  }

  def knnGraph(embeddings: DataFrame, k: Int = 3,
      kmeansK: Option[Int] = None, kmeansAuto: Boolean = false): DataFrame = {
    val corpus = prep(embeddings)
    val (bucketed, probes) = knnBlocked(corpus, kmeansK, kmeansAuto)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    bucketed.join(probes, Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(long_dot(col("q"), col("qv")), col("norm2"), col("qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** `mine_hard_negatives`: contrastive-training pair mining — for EVERY
    * vector, the k most similar vectors with a DIFFERENT label. Random
    * negatives are too easy to teach an embedding model anything; the
    * negatives that matter are the near-misses, and "nearest with another
    * label" is exactly the [[knnGraph]] shape with a label-mismatch filter
    * in the candidate predicate, so the blocking, shuffle, and TopKPerKey
    * story are inherited unchanged (the filter only THINS candidates —
    * cost stays bucket-bounded, never all-pairs).
    */
  def mineHardNegatives(embeddings: DataFrame, k: Int = 3,
      kmeansK: Option[Int] = None, kmeansAuto: Boolean = false): DataFrame = {
    val corpus = prep(embeddings)
    val (bucketed, probes) =
      knnBlocked(corpus, kmeansK, kmeansAuto, extraProbeCols = Seq("label" -> "q_label"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    bucketed.join(probes, Seq("bucket"))
      .where(col("vec_id") =!= col("query_id") && col("label") =!= col("q_label"))
      .withColumn("cosine", cosine(long_dot(col("q"), col("qv")), col("norm2"), col("qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("q_label"), col("vec_id").as("negative_id"),
        col("label").as("neg_label"), col("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** `knn_graph_auto` / `mine_hard_negatives_auto` /
    * `graph_centrality_auto`: the corpus-sized form of the kNN operators'
    * blocking — registered in [[graft.SparkEntry]] and oracled (see
    * [[oracles]]; AutoKnnSpec pins recall + geometry). The fixed
    * multiprobe default is Θ(N²/28) — fine for the oracled baseline,
    * quadratic at corpus scale (the x100 point measured 27× cpu for 10×
    * data; at x300 it stops terminating usefully). [[knnBlocked]]'s
    * documented production path is k-means (IVF) blocking with k ∝ √N:
    * training costs N·k per pass and the block self-join costs N²/k, so
    * √N balances them at Θ(N^1.5) — the standard IVF scaling law. These
    * variants pick k = clamp(⌈√N⌉, 16, 4096) from the ALREADY-STAGED
    * corpus (the sizing count doubles as the cache-fill job) and reuse
    * the exact-integer [[trainKmeans]]/[[clusterCol]] machinery, so the
    * DuckDB twin reproduces the whole pipeline — init, two truncating-
    * division training iterations, argmin assignment, block self-join,
    * rank — with k computed from COUNT(*) in SQL (the min-trick bound
    * passed to [[kmeansIterSql]] is a constant 8192 ≥ the 4096 k clamp,
    * so cluster-id encoding stays collision-free and the arithmetic
    * exact — |score|·8192 < 2⁶³ since |score| ≤ 64·(2·10⁴)² ≈ 2.6·10¹⁰).
    */
  def knnGraphAuto(embeddings: DataFrame, k: Int = 3): DataFrame =
    knnGraph(embeddings, k, kmeansAuto = true)

  def mineHardNegativesAuto(embeddings: DataFrame, k: Int = 3): DataFrame =
    mineHardNegatives(embeddings, k, kmeansAuto = true)

  def graphCentralityAuto(embeddings: DataFrame, iters: Int = 3): DataFrame =
    graphCentrality(embeddings, iters, kmeansAuto = true)

  private[graft] def autoKmeansK(n: Long): Int =
    math.max(16, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))

  private val GraphCheckpointEvery = 8

  /** `graph_centrality`: fixed-iteration PageRank over the kNN graph —
    * centrality as a CURATION signal: a high score marks documents sitting
    * in dense, mutually-similar neighborhoods (template families, SEO
    * farms, boilerplate hubs); low scores mark genuinely isolated content.
    * Scores run in exact integer ppm arithmetic — init 10⁶, damping 0.85
    * as `(85·x) div 100`, per-edge contribution `score div out_degree` —
    * for a FIXED iteration count, so there is no transcendental and no
    * convergence epsilon for the engines to diverge on: the result is
    * bit-identical to the unrolled-CTE oracle. Each iteration is one
    * (edges ⋈ scores) shuffle keyed by src plus one inflow aggregate keyed
    * by dst — the standard distributed PageRank shape, linear in |E| per
    * round; the edge list is scope-cached once instead of recomputing the
    * LSH kNN per iteration. Long arithmetic holds while
    * in_degree × 10⁶ × 85 < 2⁶³ (hubs of ~10¹⁴ in-edges) — beyond any
    * real corpus.
    *
    * Lineage discipline (the [[graft.operators.Dedup.dedupClusters]]
    * pattern, amortized): the iterate is `localCheckpoint(eager)`-truncated
    * every [[GraphCheckpointEvery]] rounds, so plan depth is bounded by
    * that constant no matter how large `iters` is — convergence-style
    * iteration counts can't blow up analysis time — while short registered
    * runs (iters ≤ the period) keep the fully lazy single-job shape, whose
    * runtime reuses the scope-cached edge exchange instead of paying an
    * eager job barrier per round (per-round checkpointing measured 5× the
    * wall-clock at iters=3: five blocking materializations of
    * vertex-count-sized frames cost more than the whole lazy run). The
    * degree table and vertex spine stay lazy for the same reason — they
    * re-derive from the cached edges / a column-pruned parquet scan inside
    * whatever segment evaluates them. Blocks of superseded iterates are
    * released by the ContextCleaner; on a real cluster set
    * `spark.graft.checkpoint.reliable=true` for reliable `.checkpoint()`
    * (see dedupClusters; CheckpointRecoverySpec pins recovery).
    */
  def graphCentrality(embeddings: DataFrame, iters: Int = 3,
      kmeansK: Option[Int] = None, kmeansAuto: Boolean = false): DataFrame = {
    // kmeansK/kmeansAuto thread through to the kNN edge build: the PageRank
    // itself is linear in |E| per round, so the graph construction's
    // blocking is this operator's entire scale story (see knnBlocked) —
    // `graph_centrality_auto` registers the k ~ sqrt(N) form; the plain
    // default stays the oracled multiprobe form
    val edges = graft.operators.CacheScope.cached(
      knnGraph(embeddings, kmeansK = kmeansK, kmeansAuto = kmeansAuto)
        .select(col("query_id").as("src"), col("neighbor_id").as("dst")))
    // loop invariants: degrees from the cached edges; the vertex spine the
    // per-round outer join re-anchors on (dangling nodes keep teleport)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val vertices = embeddings.select(col("vec_id"))
    var scores = vertices.withColumn("score_ppm", lit(1000000L))
    for (r <- 1 to iters) {
      val inflow = edges
        .join(deg, "src")
        .join(scores.select(col("vec_id").as("src"), col("score_ppm")), "src")
        .select(col("dst"), expr("score_ppm div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      scores = vertices
        .join(inflow.withColumnRenamed("dst", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"),
          (lit(150000L) + expr("(85 * coalesce(inflow, 0L)) div 100"))
            .as("score_ppm"))
      // periodic truncation bounds plan depth without charging short runs
      // an eager materialization barrier per round
      if (r % GraphCheckpointEvery == 0 && r < iters)
        scores = Iterate.materialize(scores)
    }
    scores
  }

  /** The quantize+norm oracle prefix over an arbitrary source relation —
    * `src` defaults to the raw `embeddings` table; the planted-companion
    * dedup oracles pass their derived CTE name (see Dedup.plantedCte).
    */
  private[operators] def quantCteFrom(src: String): String =
    s"""q AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
       |  FROM $src),
       |n AS (
       |  SELECT vec_id, label, q,
       |         list_sum(list_transform(list_zip(q, q), p -> p[1] * p[2])) AS norm2
       |  FROM q)""".stripMargin

  private[operators] val quantCte = quantCteFrom("embeddings")

  private lazy val bruteOracle: String =
    s"""WITH $quantCte,
         |queries AS (
         |  SELECT vec_id AS query_id, q AS qv, norm2 AS qn FROM n WHERE vec_id < 10),
         |scored AS (
         |  SELECT queries.query_id, n.vec_id AS neighbor_id,
         |         CAST(list_sum(list_transform(list_zip(n.q, queries.qv), p -> p[1] * p[2])) AS DOUBLE)
         |           / (SQRT(CAST(n.norm2 AS DOUBLE)) * SQRT(CAST(queries.qn AS DOUBLE))) AS cosine
         |  FROM n CROSS JOIN queries WHERE n.vec_id != queries.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5""".stripMargin

  private lazy val lshOracle: String =
    s"""WITH $quantCte,
         |planes AS (
         |  SELECT j, list_transform(range(0, 64), d -> (j * 131 + d * 37) % 19 - 9) AS plane
         |  FROM range(0, 8) t(j)),
         |bucketed AS (
         |  SELECT n.vec_id, n.q, n.norm2,
         |         CAST(SUM(CASE WHEN list_sum(list_transform(list_zip(n.q, p.plane), z -> z[1] * z[2])) >= 0
         |                  THEN 1 << CAST(p.j AS INTEGER) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM n CROSS JOIN planes p
         |  GROUP BY n.vec_id, n.q, n.norm2),
         |queries AS (
         |  SELECT vec_id AS query_id, q AS qv, norm2 AS qn, bucket
         |  FROM bucketed WHERE vec_id < 10),
         |probes AS (
         |  SELECT query_id, qv, qn,
         |         CASE WHEN f.f = 0 THEN bucket
         |              ELSE xor(bucket, CAST(1 AS BIGINT) << CAST(f.f - 1 AS INT)) END AS bucket
         |  FROM queries CROSS JOIN (SELECT UNNEST(range(0, 9)) AS f) f),
         |scored AS (
         |  SELECT p.query_id, b.vec_id AS neighbor_id, b.bucket,
         |         CAST(list_sum(list_transform(list_zip(b.q, p.qv), z -> z[1] * z[2])) AS DOUBLE)
         |           / (SQRT(CAST(b.norm2 AS DOUBLE)) * SQRT(CAST(p.qn AS DOUBLE))) AS cosine
         |  FROM bucketed b JOIN probes p ON b.bucket = p.bucket
         |  WHERE b.vec_id != p.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, bucket, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, bucket, cosine, rank FROM ranked WHERE rank <= 5""".stripMargin

  /** DuckDB twin of [[simSearchRecallEval]]: each method's oracle runs as a
    * CTE subquery (nested WITH — their internal CTE names scope locally),
    * then the same semi-join + count + exact-integer recall arithmetic.
    */
  private lazy val recallEvalOracle: String =
    s"""WITH exact AS ($bruteOracle),
       |lshr AS ($lshOracle),
       |ivfr AS ($ivfOracle),
       |pqr AS ($pqSearchOracle),
       |ipqr AS (${ivfPqOracle()}),
       |approx AS (
       |  SELECT 'lsh' AS method, query_id, neighbor_id FROM lshr
       |  UNION ALL SELECT 'ivf', query_id, neighbor_id FROM ivfr
       |  UNION ALL SELECT 'pq', query_id, neighbor_id FROM pqr
       |  UNION ALL SELECT 'ivfpq', query_id, neighbor_id FROM ipqr),
       |hit AS (
       |  SELECT a.method, a.query_id, COUNT(*) AS hits
       |  FROM approx a JOIN exact e USING (query_id, neighbor_id)
       |  GROUP BY 1, 2),
       |qs AS (SELECT DISTINCT query_id FROM exact),
       |methods AS (
       |  SELECT UNNEST(['lsh', 'ivf', 'pq', 'ivfpq']) AS method)
       |SELECT m.method, q.query_id,
       |       CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
       |       CAST(COALESCE(h.hits, 0) * 1000000 // 5 AS BIGINT) AS recall_ppm
       |FROM methods m CROSS JOIN qs q
       |LEFT JOIN hit h ON h.method = m.method AND h.query_id = q.query_id"""
      .stripMargin

  /** DuckDB twin of [[simSearchMrrEval]]: the [[recallEvalOracle]] CTE
    * structure with ranks carried through, MIN(rank) per (method, query),
    * reciprocal rank floored to ppm and averaged with the same `//`.
    */
  private lazy val mrrEvalOracle: String =
    s"""WITH exact AS ($bruteOracle),
       |lshr AS ($lshOracle),
       |ivfr AS ($ivfOracle),
       |pqr AS ($pqSearchOracle),
       |ipqr AS (${ivfPqOracle()}),
       |approx AS (
       |  SELECT 'lsh' AS method, query_id, neighbor_id, rank FROM lshr
       |  UNION ALL SELECT 'ivf', query_id, neighbor_id, rank FROM ivfr
       |  UNION ALL SELECT 'pq', query_id, neighbor_id, rank FROM pqr
       |  UNION ALL SELECT 'ivfpq', query_id, neighbor_id, rank FROM ipqr),
       |fh AS (
       |  SELECT a.method, a.query_id, MIN(a.rank) AS first_rank
       |  FROM approx a JOIN exact e USING (query_id, neighbor_id)
       |  GROUP BY 1, 2),
       |qs AS (SELECT DISTINCT query_id FROM exact),
       |methods AS (
       |  SELECT UNNEST(['lsh', 'ivf', 'pq', 'ivfpq']) AS method),
       |rr AS (
       |  SELECT m.method, q.query_id,
       |         COALESCE(1000000 // fh.first_rank, 0) AS rr_ppm
       |  FROM methods m CROSS JOIN qs q
       |  LEFT JOIN fh ON fh.method = m.method AND fh.query_id = q.query_id)
       |SELECT method, COUNT(*) AS n_queries,
       |       CAST(SUM(rr_ppm) AS BIGINT) AS sum_rr_ppm,
       |       CAST(SUM(rr_ppm) // COUNT(*) AS BIGINT) AS mrr_ppm
       |FROM rr GROUP BY method""".stripMargin

  /** DuckDB twin of [[simSearchNprobeCurve]]: one [[ivfPqOracle]] instance
    * per nprobe arm as nested-WITH CTEs (names scope locally), unioned and
    * scored against the brute-force exact CTE.
    */
  private lazy val nprobeCurveOracle: String = {
    val nps = Seq(1, 2, 4)
    val arms = nps.map(np => s"np$np AS (${ivfPqOracle(np)})").mkString(",\n")
    val union = nps.map(np =>
      s"SELECT CAST($np AS BIGINT) AS nprobe, query_id, neighbor_id FROM np$np")
      .mkString("\nUNION ALL\n")
    s"""WITH exact AS ($bruteOracle),
       |$arms,
       |approx AS (
       |$union),
       |hit AS (
       |  SELECT nprobe, a.query_id, COUNT(*) AS hits
       |  FROM approx a JOIN exact e USING (query_id, neighbor_id)
       |  GROUP BY 1, 2),
       |qs AS (SELECT DISTINCT query_id FROM exact),
       |nps AS (SELECT CAST(UNNEST([${nps.mkString(", ")}]) AS BIGINT) AS nprobe)
       |SELECT n.nprobe, q.query_id,
       |       CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
       |       CAST(COALESCE(h.hits, 0) * 1000000 // 5 AS BIGINT) AS recall_ppm
       |FROM nps n CROSS JOIN qs q
       |LEFT JOIN hit h ON h.nprobe = n.nprobe AND h.query_id = q.query_id"""
      .stripMargin
  }

  val oracles: Map[String, String] = Map(
    "sim_search_bruteforce" -> bruteOracle,
    "sim_search_lsh" -> lshOracle,
    "sim_search_recall_eval" -> recallEvalOracle,
    "sim_search_mrr_eval" -> mrrEvalOracle,
    "sim_search_nprobe_curve" -> nprobeCurveOracle,
    "sim_search_ivf" -> ivfOracle,
    "embed_pq" -> pqOracle,
    "sim_search_pq" -> pqSearchOracle,
    "sim_search_ivfpq" -> ivfPqOracle(),
    "embed_kmeans" -> kmeansOracle,
    "knn_graph" ->
      s"""WITH $quantCte,
         |planes AS (
         |  SELECT j, list_transform(range(0, 64), d -> (j * 131 + d * 37) % 19 - 9) AS plane
         |  FROM range(0, 8) t(j)),
         |bucketed AS (
         |  SELECT n.vec_id, n.q, n.norm2,
         |         CAST(SUM(CASE WHEN list_sum(list_transform(list_zip(n.q, p.plane), z -> z[1] * z[2])) >= 0
         |                  THEN 1 << CAST(p.j AS INTEGER) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM n CROSS JOIN planes p
         |  GROUP BY n.vec_id, n.q, n.norm2),
         |probes AS (
         |  SELECT vec_id AS query_id, q AS qv, norm2 AS qn,
         |         CASE WHEN f.f = 0 THEN bucket
         |              ELSE xor(bucket, CAST(1 AS BIGINT) << CAST(f.f - 1 AS INT)) END AS bucket
         |  FROM bucketed CROSS JOIN (SELECT UNNEST(range(0, 9)) AS f) f),
         |scored AS (
         |  SELECT p.query_id, b.vec_id AS neighbor_id,
         |         CAST(list_sum(list_transform(list_zip(b.q, p.qv), z -> z[1] * z[2])) AS DOUBLE)
         |           / (SQRT(CAST(b.norm2 AS DOUBLE)) * SQRT(CAST(p.qn AS DOUBLE))) AS cosine
         |  FROM bucketed b JOIN probes p ON b.bucket = p.bucket
         |  WHERE b.vec_id != p.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3""".stripMargin,
    "graph_centrality" -> graphCentralityOracle(3),
    "knn_graph_auto" -> knnGraphAutoOracle,
    "mine_hard_negatives_auto" -> mineHardNegativesAutoOracle,
    "graph_centrality_auto" -> graphCentralityAutoOracle(3),
    "mine_hard_negatives" ->
      s"""WITH $quantCte,
         |planes AS (
         |  SELECT j, list_transform(range(0, 64), d -> (j * 131 + d * 37) % 19 - 9) AS plane
         |  FROM range(0, 8) t(j)),
         |bucketed AS (
         |  SELECT n.vec_id, n.label, n.q, n.norm2,
         |         CAST(SUM(CASE WHEN list_sum(list_transform(list_zip(n.q, p.plane), z -> z[1] * z[2])) >= 0
         |                  THEN 1 << CAST(p.j AS INTEGER) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM n CROSS JOIN planes p
         |  GROUP BY n.vec_id, n.label, n.q, n.norm2),
         |probes AS (
         |  SELECT vec_id AS query_id, label AS q_label, q AS qv, norm2 AS qn,
         |         CASE WHEN f.f = 0 THEN bucket
         |              ELSE xor(bucket, CAST(1 AS BIGINT) << CAST(f.f - 1 AS INT)) END AS bucket
         |  FROM bucketed CROSS JOIN (SELECT UNNEST(range(0, 9)) AS f) f),
         |scored AS (
         |  SELECT p.query_id, p.q_label, b.vec_id AS negative_id, b.label AS neg_label,
         |         CAST(list_sum(list_transform(list_zip(b.q, p.qv), z -> z[1] * z[2])) AS DOUBLE)
         |           / (SQRT(CAST(b.norm2 AS DOUBLE)) * SQRT(CAST(p.qn AS DOUBLE))) AS cosine
         |  FROM bucketed b JOIN probes p ON b.bucket = p.bucket
         |  WHERE b.vec_id != p.query_id AND b.label != p.q_label),
         |ranked AS (
         |  SELECT query_id, q_label, negative_id, neg_label, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cosine DESC, negative_id) AS rank
         |  FROM scored)
         |SELECT query_id, q_label, negative_id, neg_label, cosine, rank
         |FROM ranked WHERE rank <= 3""".stripMargin,
    // same training CTEs as embed_kmeans; keeper = per-cluster argmin of
    // the exact integer centroid distance, ties to lowest vec_id
    "dedup_semantic" ->
      s"""WITH $ivfAssignCtes,
         |dist AS (
         |  SELECT f.vec_id, f.cluster,
         |         CAST(list_sum(list_transform(c.q, x -> x * x))
         |         - 2 * list_sum(list_transform(list_zip(f.q, c.q), p -> p[1] * p[2]))
         |           AS BIGINT) AS dist
         |  FROM fin f JOIN c2 c ON c.cid = f.cluster),
         |sizes AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |          FROM fin GROUP BY 1),
         |r AS (
         |  SELECT vec_id, cluster, dist,
         |         ROW_NUMBER() OVER (PARTITION BY cluster
         |                            ORDER BY dist, vec_id) AS rn
         |  FROM dist)
         |SELECT r.cluster, r.vec_id AS keeper_vec_id, r.dist AS keeper_dist,
         |       s.cluster_size
         |FROM r JOIN sizes s ON r.cluster = s.cluster
         |WHERE r.rn = 1""".stripMargin
  )

  /** `iters` unrolled exact-integer PageRank rounds over CTEs `edges`,
    * `deg`, `vertices`, `${p}s0` — each round one inflow aggregate
    * (${p}f_i) and one score projection (${p}s_i), mirroring the Spark
    * loop term for term. Shared by the multiprobe and the k-means-blocked
    * (`_auto`) oracles; the `_auto` form passes prefix "pr" so the round
    * CTEs don't collide with the k-means training CTEs (s1/s2/s3).
    */
  private def pagerankRoundsSql(iters: Int, p: String = ""): String =
    (1 to iters).map { i =>
      s"""${p}f$i AS (
         |  SELECT e.dst, SUM(s.score_ppm // d.deg) AS inflow
         |  FROM edges e JOIN deg d ON d.src = e.src
         |       JOIN ${p}s${i - 1} s ON s.vec_id = e.src
         |  GROUP BY e.dst),
         |${p}s$i AS (
         |  SELECT v.vec_id,
         |         CAST(150000 + (85 * COALESCE(f.inflow, 0)) // 100 AS BIGINT)
         |           AS score_ppm
         |  FROM vertices v LEFT JOIN ${p}f$i f ON f.dst = v.vec_id)""".stripMargin
    }.mkString(",\n")

  private def graphCentralityOracle(iters: Int): String = {
    val rounds = pagerankRoundsSql(iters)
    s"""WITH $quantCte,
       |planes AS (
       |  SELECT j, list_transform(range(0, 64), d -> (j * 131 + d * 37) % 19 - 9) AS plane
       |  FROM range(0, 8) t(j)),
       |bucketed AS (
       |  SELECT n.vec_id, n.q, n.norm2,
       |         CAST(SUM(CASE WHEN list_sum(list_transform(list_zip(n.q, p.plane), z -> z[1] * z[2])) >= 0
       |                  THEN 1 << CAST(p.j AS INTEGER) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM n CROSS JOIN planes p
       |  GROUP BY n.vec_id, n.q, n.norm2),
       |probes AS (
       |  SELECT vec_id AS query_id, q AS qv, norm2 AS qn,
       |         CASE WHEN f.f = 0 THEN bucket
       |              ELSE xor(bucket, CAST(1 AS BIGINT) << CAST(f.f - 1 AS INT)) END AS bucket
       |  FROM bucketed CROSS JOIN (SELECT UNNEST(range(0, 9)) AS f) f),
       |scored AS (
       |  SELECT p.query_id, b.vec_id AS neighbor_id,
       |         CAST(list_sum(list_transform(list_zip(b.q, p.qv), z -> z[1] * z[2])) AS DOUBLE)
       |           / (SQRT(CAST(b.norm2 AS DOUBLE)) * SQRT(CAST(p.qn AS DOUBLE))) AS cosine
       |  FROM bucketed b JOIN probes p ON b.bucket = p.bucket
       |  WHERE b.vec_id != p.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored),
       |edges AS (
       |  SELECT query_id AS src, neighbor_id AS dst FROM ranked WHERE rank <= 3),
       |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
       |vertices AS (SELECT vec_id FROM embeddings),
       |s0 AS (SELECT vec_id, CAST(1000000 AS BIGINT) AS score_ppm FROM vertices),
       |$rounds
       |SELECT vec_id, score_ppm FROM s$iters""".stripMargin
  }

  /** Shared CTE chain for the `_auto` kNN oracles: k = clamp(⌈√N⌉, 16,
    * 4096) computed from COUNT(*) in SQL, lowest-k-id init, two
    * [[kmeansIterSql]] training iterations at min-trick bound 8192 (≥ the
    * k clamp, so encoded cluster ids never collide), then the final
    * argmin assignment into `fin` carrying label/norm2 for the downstream
    * self-join. Mirrors [[knnBlocked]]'s kmeansAuto branch term for term.
    */
  private def autoKnnCtes: String =
    s"""$quantCte,
       |kp AS (
       |  SELECT GREATEST(16, LEAST(4096,
       |           CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) AS kk
       |  FROM n),
       |c0 AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, q
       |  FROM n QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= (SELECT kk FROM kp)),
       |${kmeansIterSql(1, "c0", "", "n", 64, bound = 8192)},
       |${kmeansIterSql(2, "c1", "", "n", 64, bound = 8192)},
       |s3 AS (
       |  SELECT n.vec_id, n.label, n.q, n.norm2, c.cid,
       |         list_sum(list_transform(c.q, x -> x * x))
       |         - 2 * list_sum(list_transform(list_zip(n.q, c.q), p -> p[1] * p[2])) AS score
       |  FROM n CROSS JOIN c2 c),
       |fin AS (
       |  SELECT vec_id, label, q, norm2,
       |         CAST(((MIN(score * 8192 + cid) % 8192) + 8192) % 8192 AS BIGINT) AS bucket
       |  FROM s3 GROUP BY vec_id, label, q, norm2)""".stripMargin

  /** kNN edge CTEs over the k-means blocking (each vector probes only its
    * own cluster — [[knnBlocked]]'s kmeansK branch has no multiprobe
    * flips), ranked to `knnK` neighbors.
    */
  private def autoKnnRankedCtes: String =
    s"""$autoKnnCtes,
       |scored AS (
       |  SELECT p.vec_id AS query_id, b.vec_id AS neighbor_id,
       |         CAST(list_sum(list_transform(list_zip(b.q, p.q), z -> z[1] * z[2])) AS DOUBLE)
       |           / (SQRT(CAST(b.norm2 AS DOUBLE)) * SQRT(CAST(p.norm2 AS DOUBLE))) AS cosine
       |  FROM fin b JOIN fin p ON b.bucket = p.bucket
       |  WHERE b.vec_id != p.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)""".stripMargin

  private def knnGraphAutoOracle: String =
    s"""WITH $autoKnnRankedCtes
       |SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3""".stripMargin

  private def mineHardNegativesAutoOracle: String =
    s"""WITH $autoKnnCtes,
       |scored AS (
       |  SELECT p.vec_id AS query_id, p.label AS q_label,
       |         b.vec_id AS negative_id, b.label AS neg_label,
       |         CAST(list_sum(list_transform(list_zip(b.q, p.q), z -> z[1] * z[2])) AS DOUBLE)
       |           / (SQRT(CAST(b.norm2 AS DOUBLE)) * SQRT(CAST(p.norm2 AS DOUBLE))) AS cosine
       |  FROM fin b JOIN fin p ON b.bucket = p.bucket
       |  WHERE b.vec_id != p.vec_id AND b.label != p.label),
       |ranked AS (
       |  SELECT query_id, q_label, negative_id, neg_label, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, negative_id) AS rank
       |  FROM scored)
       |SELECT query_id, q_label, negative_id, neg_label, cosine, rank
       |FROM ranked WHERE rank <= 3""".stripMargin

  private def graphCentralityAutoOracle(iters: Int): String =
    s"""WITH $autoKnnRankedCtes,
       |edges AS (
       |  SELECT query_id AS src, neighbor_id AS dst FROM ranked WHERE rank <= 3),
       |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
       |vertices AS (SELECT vec_id FROM embeddings),
       |prs0 AS (SELECT vec_id, CAST(1000000 AS BIGINT) AS score_ppm FROM vertices),
       |${pagerankRoundsSql(iters, p = "pr")}
       |SELECT vec_id, score_ppm FROM prs$iters""".stripMargin

  /** One k-means iteration in SQL: assign each vector to the argmin centroid
    * (exact integer score ||c||^2 - 2 x.c, ties to lowest cid via the
    * score*32+cid encoding — matches Spark's least-of-struct), then update
    * centroids with exact integer (2s+n)/(2n) truncated toward zero — the
    * negative branch is sign-guarded (CASE on 2s+n) so the oracle matches
    * Scala `/` whether a DuckDB build truncates or floors `//`; empty
    * clusters keep their previous centroid. Mirrors simSearchIvf's driver
    * loop.
    */
  private def ivfIterSql(i: Int, prev: String): String =
    kmeansIterSql(i, prev, tag = "", nTable = "n", dim = 64)

  /** One k-means iteration in SQL over vector table `nTable` (columns
    * vec_id, q of length `dim`), CTE names suffixed with `tag` so several
    * independent trainings (the PQ subspaces) can coexist in one WITH.
    */
  private def kmeansIterSql(
      i: Int, prev: String, tag: String, nTable: String, dim: Int,
      bound: Int = 32): String =
    s"""s$i$tag AS (
       |  SELECT n.vec_id, n.q, c.cid,
       |         list_sum(list_transform(c.q, x -> x * x))
       |         - 2 * list_sum(list_transform(list_zip(n.q, c.q), p -> p[1] * p[2])) AS score
       |  FROM $nTable n CROSS JOIN $prev c),
       |a$i$tag AS (
       |  SELECT vec_id, q,
       |         CAST(((MIN(score * $bound + cid) % $bound) + $bound) % $bound AS BIGINT) AS cluster
       |  FROM s$i$tag GROUP BY vec_id, q),
       |u$i$tag AS (
       |  SELECT cluster, d.d, SUM(q[CAST(d.d + 1 AS INT)]) AS s, COUNT(*) AS cnt
       |  FROM a$i$tag CROSS JOIN (SELECT UNNEST(range(0, $dim)) AS d) d
       |  GROUP BY 1, 2),
       |c$i$tag AS (
       |  SELECT p.cid, COALESCE(u.qq, p.q) AS q
       |  FROM $prev p LEFT JOIN (
       |    SELECT cluster AS cid,
       |           list(CASE WHEN 2 * s + cnt >= 0 THEN (2 * s + cnt) // (2 * cnt)
       |                     ELSE -((-(2 * s + cnt)) // (2 * cnt)) END ORDER BY d) AS qq
       |    FROM u$i$tag GROUP BY 1) u ON u.cid = p.cid)""".stripMargin

  /** Shared oracle prefix: quantize → train (2 iterations) → final cluster
    * assignment in `fin` — used by both `sim_search_ivf` and `embed_kmeans`.
    */
  private def ivfAssignCtes: String =
    s"""$quantCte,
       |c0 AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, q
       |  FROM (SELECT vec_id, q FROM n ORDER BY vec_id LIMIT 16)),
       |${ivfIterSql(1, "c0")},
       |${ivfIterSql(2, "c1")},
       |s3 AS (
       |  SELECT n.vec_id, n.q, n.norm2, c.cid,
       |         list_sum(list_transform(c.q, x -> x * x))
       |         - 2 * list_sum(list_transform(list_zip(n.q, c.q), p -> p[1] * p[2])) AS score
       |  FROM n CROSS JOIN c2 c),
       |fin AS (
       |  SELECT vec_id, q, norm2,
       |         CAST(((MIN(score * 32 + cid) % 32) + 32) % 32 AS BIGINT) AS cluster
       |  FROM s3 GROUP BY vec_id, q, norm2)""".stripMargin

  /** PQ sub-oracle for subspace `si`: slice, deterministic init, two
    * k-means iterations, final assignment — CTE names tagged `p<si>`.
    */
  private def pqSubCtes(si: Int, sub: Int, k: Int, src: String = "n"): String = {
    val lo = si * sub + 1
    val hi = (si + 1) * sub
    val t = s"p$si"
    s"""n$t AS (SELECT vec_id, q[$lo:$hi] AS q FROM $src),
       |c0$t AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, q
       |  FROM (SELECT vec_id, q FROM n$t ORDER BY vec_id LIMIT $k)),
       |${kmeansIterSql(1, s"c0$t", t, s"n$t", sub)},
       |${kmeansIterSql(2, s"c1$t", t, s"n$t", sub)},
       |s3$t AS (
       |  SELECT n.vec_id, c.cid,
       |         list_sum(list_transform(c.q, x -> x * x))
       |         - 2 * list_sum(list_transform(list_zip(n.q, c.q), p -> p[1] * p[2])) AS score
       |  FROM n$t n CROSS JOIN c2$t c),
       |fin$t AS (
       |  SELECT vec_id,
       |         CAST(((MIN(score * 32 + cid) % 32) + 32) % 32 AS BIGINT) AS code_$si
       |  FROM s3$t GROUP BY vec_id)""".stripMargin
  }

  private def pqOracle: String = {
    val subs = (0 until 4).map(si => pqSubCtes(si, 16, 8)).mkString(",\n")
    s"""WITH $quantCte,
       |$subs
       |SELECT f0.vec_id, f0.code_0, f1.code_1, f2.code_2, f3.code_3,
       |       ((f0.code_0 * 8 + f1.code_1) * 8 + f2.code_2) * 8 + f3.code_3 AS pq_code
       |FROM finp0 f0
       |JOIN finp1 f1 ON f0.vec_id = f1.vec_id
       |JOIN finp2 f2 ON f0.vec_id = f2.vec_id
       |JOIN finp3 f3 ON f0.vec_id = f3.vec_id""".stripMargin
  }

  /** ADC search oracle: reuses the four PQ sub-oracles (codes + final
    * codebooks c2p<si>), builds each query's exact-integer LUT, sums four
    * lookups per (query, corpus) pair, ranks.
    */
  /** Per-query per-subspace exact-integer LUT CTEs (lut0..lut3) over the
    * final PQ codebooks c2p<si> — shared by `sim_search_pq` and
    * `sim_search_ivfpq`.
    */
  private def pqLutCtes: String =
    (0 until 4).map { si =>
      val lo = si * 16 + 1
      val hi = (si + 1) * 16
      s"""qsub$si AS (
         |  SELECT vec_id AS query_id, q[$lo:$hi] AS qs FROM n WHERE vec_id < 10),
         |lut$si AS (
         |  SELECT q.query_id, c.cid,
         |         list_sum(list_transform(q.qs, x -> x * x))
         |         - 2 * list_sum(list_transform(list_zip(q.qs, c.q), p -> p[1] * p[2]))
         |         + list_sum(list_transform(c.q, x -> x * x)) AS dist
         |  FROM qsub$si q CROSS JOIN c2p$si c)""".stripMargin
    }.mkString(",\n")

  private def pqSearchOracle: String = {
    val subs = (0 until 4).map(si => pqSubCtes(si, 16, 8)).mkString(",\n")
    val luts = pqLutCtes
    s"""WITH $quantCte,
       |$subs,
       |$luts,
       |adc AS (
       |  SELECT l0.query_id, f0.vec_id AS neighbor_id,
       |         l0.dist + l1.dist + l2.dist + l3.dist AS adc
       |  FROM finp0 f0
       |  JOIN finp1 f1 ON f0.vec_id = f1.vec_id
       |  JOIN finp2 f2 ON f0.vec_id = f2.vec_id
       |  JOIN finp3 f3 ON f0.vec_id = f3.vec_id
       |  JOIN lut0 l0 ON l0.cid = f0.code_0
       |  JOIN lut1 l1 ON l1.query_id = l0.query_id AND l1.cid = f1.code_1
       |  JOIN lut2 l2 ON l2.query_id = l0.query_id AND l2.cid = f2.code_2
       |  JOIN lut3 l3 ON l3.query_id = l0.query_id AND l3.cid = f3.code_3
       |  WHERE f0.vec_id != l0.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adc,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY adc, neighbor_id) AS rank
       |  FROM adc)
       |SELECT query_id, neighbor_id, CAST(adc AS BIGINT) AS adc,
       |       CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= 5""".stripMargin
  }

  private[operators] def kmeansOracle: String =
    s"""WITH $ivfAssignCtes,
       |sizes AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |          FROM fin GROUP BY 1)
       |SELECT f.vec_id, f.cluster, s.cluster_size
       |FROM fin f JOIN sizes s ON f.cluster = s.cluster""".stripMargin

  /** IVF coarse assignment (ivfAssignCtes → fin) + residual PQ: the corpus
    * residual table `res` (q − its list's centroid) trains the four
    * sub-oracles; each query probes its nprobe=2 nearest coarse centroids
    * (exact integer score, cid tiebreak — rank 1 is its own cluster) and
    * builds a LUT per probed list from the residual q − c_list; candidates
    * come from the probed lists, ranked by the four-lookup ADC sum — the
    * SQL twin of [[simSearchIvfPq]].
    */
  private def ivfPqOracle(nprobe: Int = 2): String = {
    val subs = (0 until 4).map(si => pqSubCtes(si, 16, 8, src = "res")).mkString(",\n")
    val luts = (0 until 4).map { si =>
      val lo = si * 16 + 1
      val hi = (si + 1) * 16
      s"""lutq$si AS (
         |  SELECT q.query_id, q.cluster, c.cid,
         |         list_sum(list_transform(q.qs, x -> x * x))
         |         - 2 * list_sum(list_transform(list_zip(q.qs, c.q), p -> p[1] * p[2]))
         |         + list_sum(list_transform(c.q, x -> x * x)) AS dist
         |  FROM (SELECT query_id, cluster, q[$lo:$hi] AS qs FROM qres) q
         |  CROSS JOIN c2p$si c)""".stripMargin
    }.mkString(",\n")
    s"""WITH $ivfAssignCtes,
       |res AS (
       |  SELECT f.vec_id, f.cluster,
       |         list_transform(list_zip(f.q, c.q), p -> p[1] - p[2]) AS q
       |  FROM fin f JOIN c2 c ON c.cid = f.cluster),
       |$subs,
       |qsel AS (
       |  SELECT query_id, cid AS cluster FROM (
       |    SELECT query_id, cid,
       |           ROW_NUMBER() OVER (PARTITION BY query_id
       |                              ORDER BY score, cid) AS rn
       |    FROM (
       |      SELECT nq.vec_id AS query_id, c.cid,
       |             list_sum(list_transform(c.q, x -> x * x))
       |             - 2 * list_sum(list_transform(list_zip(nq.q, c.q), p -> p[1] * p[2]))
       |               AS score
       |      FROM (SELECT vec_id, q FROM n WHERE vec_id < 10) nq
       |      CROSS JOIN c2 c))
       |  WHERE rn <= $nprobe),
       |qres AS (
       |  SELECT qs.query_id, qs.cluster,
       |         list_transform(list_zip(nq.q, c.q), p -> p[1] - p[2]) AS q
       |  FROM qsel qs
       |  JOIN n nq ON nq.vec_id = qs.query_id
       |  JOIN c2 c ON c.cid = qs.cluster),
       |$luts,
       |adcq AS (
       |  SELECT l0.query_id, f0.vec_id AS neighbor_id, fc.cluster,
       |         l0.dist + l1.dist + l2.dist + l3.dist AS adc
       |  FROM finp0 f0
       |  JOIN finp1 f1 ON f0.vec_id = f1.vec_id
       |  JOIN finp2 f2 ON f0.vec_id = f2.vec_id
       |  JOIN finp3 f3 ON f0.vec_id = f3.vec_id
       |  JOIN fin fc ON fc.vec_id = f0.vec_id
       |  JOIN lutq0 l0 ON l0.cluster = fc.cluster AND l0.cid = f0.code_0
       |  JOIN lutq1 l1 ON l1.query_id = l0.query_id AND l1.cluster = fc.cluster
       |       AND l1.cid = f1.code_1
       |  JOIN lutq2 l2 ON l2.query_id = l0.query_id AND l2.cluster = fc.cluster
       |       AND l2.cid = f2.code_2
       |  JOIN lutq3 l3 ON l3.query_id = l0.query_id AND l3.cluster = fc.cluster
       |       AND l3.cid = f3.code_3
       |  WHERE f0.vec_id != l0.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cluster, adc,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY adc, neighbor_id) AS rank
       |  FROM adcq)
       |SELECT query_id, neighbor_id, cluster, CAST(adc AS BIGINT) AS adc,
       |       CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= 5""".stripMargin
  }

  private def ivfOracle: String =
    s"""WITH $ivfAssignCtes,
       |queries AS (
       |  SELECT vec_id AS query_id, q AS qv, norm2 AS qn, cluster
       |  FROM fin WHERE vec_id < 10),
       |scored AS (
       |  SELECT qr.query_id, f.vec_id AS neighbor_id, f.cluster,
       |         CAST(list_sum(list_transform(list_zip(f.q, qr.qv), z -> z[1] * z[2])) AS DOUBLE)
       |           / (SQRT(CAST(f.norm2 AS DOUBLE)) * SQRT(CAST(qr.qn AS DOUBLE))) AS cosine
       |  FROM fin f JOIN queries qr ON f.cluster = qr.cluster
       |  WHERE f.vec_id != qr.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cluster, cosine,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cluster, cosine, rank FROM ranked WHERE rank <= 5""".stripMargin
}
