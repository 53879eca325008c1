package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): media as opaque BINARY columns
  * with typed metadata, decode/feature-extract as batched per-partition
  * transforms. The container has no image/audio codecs, so the decode step is
  * a clearly-marked deterministic STUB — the Spark-side plumbing (schema,
  * binary column, partitioning, batch shape) is real and oracle-checked where
  * expressible.
  *
  * Scale: `media` rows are wide (payload-heavy); the mapPartitions decode
  * streams batches without collecting, and metadata-only queries prune the
  * payload column at the parquet scan (columnar: the 100 TB of bytes is never
  * read unless the payload is referenced).
  */
object Multimodal {

  /** documents → media table: payload as BINARY + typed metadata (the shape
    * an image/audio ingest would produce).
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("lang").as("lang_hint")).as("meta"))

  /** `mm_metadata`: metadata/pruning query — never touches payload bytes
    * beyond length (oracle-checked).
    */
  def mmMetadata(documents: DataFrame): DataFrame =
    mediaTable(documents).select(
      col("media_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.lang_hint").as("lang_hint"),
      when(col("meta.n_bytes") >= 400, "large")
        .when(col("meta.n_bytes") >= 200, "medium")
        .otherwise("small").as("size_bucket"))

  /** Hex-digit value of a 1-char column from `hex(binary)` output (0-9A-F). */
  private def hexVal(c: Column): Column =
    when(ascii(c) >= 65, ascii(c) - 55).otherwise(ascii(c) - 48)

  /** Byte value at 0-based offset `i` of a hex-encoded binary string. */
  private def byteAt(hx: Column, i: Column): Column =
    (hexVal(hx.substr(i * 2 + 1, lit(1))) * 16 +
      hexVal(hx.substr(i * 2 + 2, lit(1)))).cast("long")

  /** `mm_decode_stub`: the decode/feature-extract stage as a pure Catalyst
    * expression chain over the BINARY column — stays in whole-stage codegen,
    * never leaves Tungsten rows, and is fully oracle-checkable. The "decode"
    * is a deterministic STUB (byte-stat features; the container has no media
    * codecs): a real deployment swaps the feature expressions for a codec
    * call via [[mmDecodeBatched]]'s typed per-partition shape — schema and
    * partition layout stay identical. Features are emitted as scalar DOUBLE
    * columns (not an array) so every output column is sortable/hashable.
    */
  def mmDecodeStub(documents: DataFrame): DataFrame = {
    val media = mediaTable(documents)
    val hx = hex(col("payload"))
    media
      .withColumn("n_bytes", col("meta.n_bytes"))
      .withColumn("head_byte",
        when(col("n_bytes") > 0, byteAt(hx, lit(0))).otherwise(0L))
      .withColumn("byte_checksum",
        when(col("n_bytes") > 0,
          aggregate(sequence(lit(0L), col("n_bytes") - 1), lit(0L),
            (acc, i) => acc + byteAt(hx, i)) % 65536)
          .otherwise(0L))
      .select(
        col("media_id"), col("n_bytes"), col("head_byte"), col("byte_checksum"),
        // fake 4-dim "embedding" from byte stats — placeholder for model output
        col("n_bytes").cast("double").as("feat_len"),
        col("head_byte").cast("double").as("feat_head"),
        col("byte_checksum").cast("double").as("feat_checksum"),
        (col("byte_checksum") % 7).cast("double").as("feat_mod"))
  }

  /** Decoded media row for the typed codec-boundary variant. */
  final case class DecodedMedia(
      media_id: Long, n_bytes: Long, head_byte: Long, byte_checksum: Long,
      feat_len: Double, feat_head: Double, feat_checksum: Double, feat_mod: Double)

  /** The codec-boundary shape for a REAL decoder: typed per-partition batches
    * over (id, payload) with encoders — the Spark-4 JVM analog of
    * `mapInPandas` batching. Kept alongside the Catalyst chain because an
    * actual image/audio codec is an opaque native call that cannot be an
    * expression; MultimodalSpec asserts this variant is row-identical to
    * [[mmDecodeStub]]. Streams partitions (no collect); Tungsten-encoded at
    * both boundaries, so no RDD round-trip.
    */
  def mmDecodeBatched(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    mediaTable(documents)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          var checksum = 0L
          var i = 0
          while (i < payload.length) { checksum = (checksum + (payload(i) & 0xff)) % 65536; i += 1 }
          val head = if (payload.isEmpty) 0L else (payload(0) & 0xff).toLong
          DecodedMedia(id, payload.length.toLong, head, checksum,
            payload.length.toDouble, head.toDouble, checksum.toDouble, (checksum % 7).toDouble)
        }
      }
      .toDF()
  }

  /** `mm_frame_sample`: frame/segment sampling plumbing — split each payload
    * into fixed-size "frames", sample every k-th, one output row per sampled
    * frame (the video-frame-sampling access pattern; oracle-checked since
    * framing is pure arithmetic on bytes→text here).
    */
  def mmFrameSample(documents: DataFrame): DataFrame = {
    val frameSize = 64
    val every = 4
    mediaTable(documents)
      .withColumn("n_frames",
        expr(s"(meta.n_bytes + $frameSize - 1) div $frameSize"))
      // guard n_frames=0: sequence(0,-1) would yield a DESCENDING [0,-1]
      .withColumn("frames",
        when(col("n_frames") > 0, sequence(lit(0L), col("n_frames") - 1))
          .otherwise(array().cast("array<bigint>")))
      .select(col("media_id"), col("meta.n_bytes").as("n_bytes"),
        posexplode(col("frames")).as(Seq("frame_pos", "frame_idx")))
      .where(col("frame_idx") % every === 0)
      .select(col("media_id"), col("n_bytes"), col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * frameSize).cast("long").as("frame_offset"))
  }

  /** `mm_content_dedup`: exact dedup of media PAYLOADS by content digest —
    * the multimodal twin of `dedup_exact` (re-crawled images, mirrored
    * videos and re-encoded copies of the same bytes are the dominant
    * duplicate class in media corpora). The digest is computed from the
    * BINARY column in one codegen'd projection, and only (digest, metadata)
    * shuffles to the group-by — never the payload bytes, which at 100 TB is
    * the difference between shuffling ~3 KB and ~100 TB. Emits one row per
    * distinct content with its canonical (smallest) media_id and replica
    * count, ready for a semi-join back to drop the copies.
    */
  def mmContentDedup(documents: DataFrame): DataFrame =
    mediaTable(documents)
      .select(col("media_id"), md5(col("payload")).as("digest"),
        col("meta.n_bytes").as("n_bytes"))
      // n_bytes is functionally determined by the digest's preimage; keeping
      // it in the key costs nothing and spares a rejoin for size audits
      .groupBy(col("digest"), col("n_bytes"))
      .agg(min(col("media_id")).as("canonical_id"),
        count(lit(1)).as("n_replicas"))

  /** The aspect-ratio bucket ladder: (width, height) training shapes at a
    * fixed pixel budget, portrait → landscape — the multi-aspect bucketing
    * ladder popularized by SDXL-class image-model training (public recipe:
    * group images by nearest aspect bucket so a batch shares one shape and
    * no image is cropped more than bucket-to-bucket distance).
    */
  private[graft] val AspectBuckets: Seq[(Long, Long)] = Seq(
    (512L, 2048L), (640L, 1536L), (768L, 1344L), (832L, 1216L),
    (1024L, 1024L), (1216L, 832L), (1344L, 768L), (1536L, 640L),
    (2048L, 512L))
  private[graft] val AspectBatchSize = 32L

  /** `mm_aspect_bucket`: aspect-ratio bucketing + per-bucket batch
    * assignment — the layout step between a decoded image corpus and a
    * vision training loop. Each media row (deterministic synthetic
    * width/height standing in for decoded dims — the container has no
    * codecs; a real ingest carries them in the typed metadata struct)
    * is assigned the ladder bucket with the nearest aspect ratio, then
    * batches are formed WITHIN a bucket so every batch shares one shape.
    *
    * Exact-integer discipline: ratio in ppm via `div`; nearest bucket by
    * `least` over the 9 encoded |Δppm|·16+idx values (the [[TextAnalysis]]
    * argmax-encoding trick, ties → smaller idx = more-portrait bucket), so
    * the assignment is bit-identical in DuckDB. Batch formation is a
    * row_number window PARTITIONED by bucket (9 partitions of ~N/9 — at
    * 100 TB a deployment range-partitions within bucket by media_id; the
    * semantics stay a per-bucket ordinal, which is what the batch sampler
    * consumes). The whole assignment is one codegen'd projection — no
    * join, no shuffle before the per-bucket window.
    */
  def mmAspectBucket(documents: DataFrame): DataFrame = {
    val dims = mediaTable(documents).select(
      col("media_id"),
      (lit(256L) + (col("media_id") * 37L) % 1793L).as("width"),
      (lit(256L) + (col("media_id") * 53L) % 1793L).as("height"))
    val withRatio = dims.withColumn("ratio_ppm",
      expr("(cast(width as decimal(38,0)) * 1000000) div height").cast("long"))
    val encoded = AspectBuckets.zipWithIndex.map { case ((w, h), i) =>
      abs(col("ratio_ppm") - lit(w * 1000000L / h)) * 16L + i
    }
    val idx = (least(encoded: _*) % 16L).cast("int")
    val bucketed = withRatio
      .withColumn("bucket_idx", idx.cast("long"))
      .withColumn("bucket_w",
        AspectBuckets.zipWithIndex.foldLeft(lit(null).cast("long")) {
          case (acc, ((w, _), i)) => when(col("bucket_idx") === i, w).otherwise(acc)
        })
      .withColumn("bucket_h",
        AspectBuckets.zipWithIndex.foldLeft(lit(null).cast("long")) {
          case (acc, ((_, h), i)) => when(col("bucket_idx") === i, h).otherwise(acc)
        })
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket_idx").orderBy("media_id")
    bucketed.withColumn("batch_idx",
      ((row_number().over(w) - 1) / AspectBatchSize).cast("long"))
      .select(col("media_id"), col("width"), col("height"), col("ratio_ppm"),
        col("bucket_idx"), col("bucket_w"), col("bucket_h"), col("batch_idx"))
  }

  /** Alignment-score keep threshold for [[mmTextAlign]] (ppm cosine). */
  private[graft] val AlignKeepPpm = 999000L

  /** `mm_text_align`: cross-modal (media, caption) alignment filtering —
    * the LAION-style recipe: embed both sides, score each PAIR, keep pairs
    * above a similarity threshold. The embedders are deterministic STUBS
    * (no codecs/models in the container): the media side reads features
    * off the BINARY payload (first byte, byte length — what a real image
    * encoder boundary would replace), the text side reads the caption
    * string; for a correctly-paired row the two views describe the same
    * underlying object, so the stub reproduces the essential property the
    * filter exploits — matched pairs score high, mismatched pairs score on
    * whatever the two objects happen to share. The demo pair table carries
    * each media row twice: once with its own caption (`aligned` = true)
    * and once with a shifted doc's caption (false), so the oracle-checked
    * output certifies the filter DISCRIMINATES, not just that it runs —
    * the non-vacuity discipline.
    *
    * Exactness: score = cosine in ppm over the 2-dim integer features,
    * with floor-sqrt norms (`floor(sqrt(x))` is correctly rounded IEEE,
    * exact for x < 2⁵² — [[Curation.mixPlanTemperature]]'s contract), so
    * the whole report is hash-exact. Scale shape: the pair table is a
    * doc_id-keyed join of two narrow projections (payload bytes never
    * shuffle — features project at the scan), one codegen'd score
    * projection, one 4-row rollup.
    */
  def mmTextAlign(documents: DataFrame): DataFrame = {
    val media = mediaTable(documents)
      .select(col("media_id"),
        col("meta.n_bytes").as("m_len"),
        when(col("meta.n_bytes") > 0, byteAt(hex(col("payload")), lit(0)))
          .otherwise(0L).as("m_head"))
    // t_head = first UTF-8 BYTE via the hex-pair decode (same path as m_head,
    // proven byte-exact in both engines). Spark's ascii() returns the first
    // byte SIGNED (-28 for a CJK lead byte) while DuckDB's ascii() returns the
    // Unicode CODEPOINT (20013) — either choice diverges on non-ASCII text, so
    // neither is used: both sides decode the byte from hex(encode(text)).
    val captions = documents.select(col("doc_id"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("t_len"),
      when(octet_length(encode(col("text"), "UTF-8")) > 0,
        byteAt(hex(encode(col("text"), "UTF-8")), lit(0)))
        .otherwise(0L).as("t_head"))
    val total = documents.agg(max(col("doc_id")).as("max_id"))
    val pairs = media.crossJoin(broadcast(total))
      .select(col("media_id"), col("m_len"), col("m_head"),
        explode(array(
          struct(col("media_id").as("doc_id"), lit(true).as("aligned")),
          struct(pmod(col("media_id") + 7L, col("max_id") + 1L).as("doc_id"),
            lit(false).as("aligned")))).as("p"))
      .select(col("media_id"), col("m_len"), col("m_head"),
        col("p.doc_id").as("doc_id"), col("p.aligned").as("aligned"))
    pairs.join(captions, Seq("doc_id"))
      .withColumn("dot", col("m_len") * col("t_len") + col("m_head") * col("t_head"))
      .withColumn("n1", col("m_len") * col("m_len") + col("m_head") * col("m_head"))
      .withColumn("n2", col("t_len") * col("t_len") + col("t_head") * col("t_head"))
      .withColumn("score_ppm",
        when(col("n1") > 0 && col("n2") > 0,
          expr("(cast(dot as decimal(38,0)) * 1000000) div " +
            "(cast(floor(sqrt(cast(n1 as double))) as bigint) * " +
            "cast(floor(sqrt(cast(n2 as double))) as bigint))").cast("long"))
          .otherwise(lit(0L)))
      .withColumn("kept", col("score_ppm") >= AlignKeepPpm)
      .groupBy(col("aligned"), col("kept"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(score_ppm) div count(1)").as("avg_score_ppm"))
  }

  /** Shared by `mm_decode_stub` and `mm_decode_batched`: the two variants
    * are row-identical by contract (same deterministic byte-stat "decode",
    * expression chain vs typed per-partition batches), so they share one
    * oracle — proving the codec-boundary shape against SQL, not just
    * against the stub in MultimodalSpec.
    */
  private val decodeSql: String =
      """WITH m AS (
        |  SELECT doc_id AS media_id, encode(text) AS b FROM documents),
        |h AS (
        |  SELECT media_id, CAST(octet_length(b) AS BIGINT) AS n_bytes, hex(b) AS hx FROM m),
        |d AS (
        |  SELECT media_id, n_bytes,
        |         CASE WHEN n_bytes > 0 THEN
        |           (CASE WHEN ascii(substr(hx, 1, 1)) >= 65
        |                 THEN ascii(substr(hx, 1, 1)) - 55
        |                 ELSE ascii(substr(hx, 1, 1)) - 48 END) * 16
        |           + (CASE WHEN ascii(substr(hx, 2, 1)) >= 65
        |                   THEN ascii(substr(hx, 2, 1)) - 55
        |                   ELSE ascii(substr(hx, 2, 1)) - 48 END)
        |         ELSE 0 END AS head_byte,
        |         CAST(COALESCE(list_sum(list_transform(range(0, n_bytes), i ->
        |           (CASE WHEN ascii(substr(hx, CAST(2*i+1 AS INT), 1)) >= 65
        |                 THEN ascii(substr(hx, CAST(2*i+1 AS INT), 1)) - 55
        |                 ELSE ascii(substr(hx, CAST(2*i+1 AS INT), 1)) - 48 END) * 16
        |           + (CASE WHEN ascii(substr(hx, CAST(2*i+2 AS INT), 1)) >= 65
        |                   THEN ascii(substr(hx, CAST(2*i+2 AS INT), 1)) - 55
        |                   ELSE ascii(substr(hx, CAST(2*i+2 AS INT), 1)) - 48 END))), 0)
        |           % 65536 AS BIGINT) AS byte_checksum
        |  FROM h)
        |SELECT media_id, n_bytes, CAST(head_byte AS BIGINT) AS head_byte, byte_checksum,
        |       CAST(n_bytes AS DOUBLE) AS feat_len,
        |       CAST(head_byte AS DOUBLE) AS feat_head,
        |       CAST(byte_checksum AS DOUBLE) AS feat_checksum,
        |       CAST(byte_checksum % 7 AS DOUBLE) AS feat_mod
        |FROM d""".stripMargin

  private val aspectBucketSql: String = {
    val enc = AspectBuckets.zipWithIndex.map { case ((w, h), i) =>
      s"ABS(ratio_ppm - ${w * 1000000L / h}) * 16 + $i"
    }.mkString(",\n         ")
    val wCase = AspectBuckets.zipWithIndex
      .map { case ((w, _), i) => s"WHEN $i THEN $w" }.mkString(" ")
    val hCase = AspectBuckets.zipWithIndex
      .map { case ((_, h), i) => s"WHEN $i THEN $h" }.mkString(" ")
    s"""WITH dims AS (
       |  SELECT doc_id AS media_id,
       |         256 + (doc_id * 37) % 1793 AS width,
       |         256 + (doc_id * 53) % 1793 AS height
       |  FROM documents),
       |r AS (
       |  SELECT media_id, width, height,
       |         CAST((width::HUGEINT * 1000000) // height AS BIGINT) AS ratio_ppm
       |  FROM dims),
       |b AS (
       |  SELECT *, CAST(LEAST(
       |         $enc) % 16 AS BIGINT) AS bucket_idx
       |  FROM r)
       |SELECT media_id, CAST(width AS BIGINT) AS width,
       |       CAST(height AS BIGINT) AS height, ratio_ppm, bucket_idx,
       |       CAST(CASE bucket_idx $wCase END AS BIGINT) AS bucket_w,
       |       CAST(CASE bucket_idx $hCase END AS BIGINT) AS bucket_h,
       |       CAST((ROW_NUMBER() OVER (PARTITION BY bucket_idx ORDER BY media_id)
       |             - 1) // ${AspectBatchSize} AS BIGINT) AS batch_idx
       |FROM b""".stripMargin
  }

  private val textAlignSql: String =
    s"""WITH media AS (
       |  SELECT doc_id AS media_id,
       |         CAST(octet_length(encode(text)) AS BIGINT) AS m_len,
       |         CASE WHEN octet_length(encode(text)) > 0 THEN
       |           (CASE WHEN ascii(substr(hex(encode(text)), 1, 1)) >= 65
       |                 THEN ascii(substr(hex(encode(text)), 1, 1)) - 55
       |                 ELSE ascii(substr(hex(encode(text)), 1, 1)) - 48 END) * 16
       |           + (CASE WHEN ascii(substr(hex(encode(text)), 2, 1)) >= 65
       |                   THEN ascii(substr(hex(encode(text)), 2, 1)) - 55
       |                   ELSE ascii(substr(hex(encode(text)), 2, 1)) - 48 END)
       |         ELSE 0 END AS m_head
       |  FROM documents),
       |caps AS (
       |  SELECT doc_id,
       |         CAST(octet_length(encode(text)) AS BIGINT) AS t_len,
       |         CASE WHEN octet_length(encode(text)) > 0 THEN
       |           (CASE WHEN ascii(substr(hex(encode(text)), 1, 1)) >= 65
       |                 THEN ascii(substr(hex(encode(text)), 1, 1)) - 55
       |                 ELSE ascii(substr(hex(encode(text)), 1, 1)) - 48 END) * 16
       |           + (CASE WHEN ascii(substr(hex(encode(text)), 2, 1)) >= 65
       |                   THEN ascii(substr(hex(encode(text)), 2, 1)) - 55
       |                   ELSE ascii(substr(hex(encode(text)), 2, 1)) - 48 END)
       |         ELSE 0 END AS t_head
       |  FROM documents),
       |mx AS (SELECT MAX(doc_id) AS max_id FROM documents),
       |pairs AS (
       |  SELECT media_id, m_len, m_head, media_id AS doc_id, TRUE AS aligned
       |  FROM media
       |  UNION ALL
       |  SELECT media_id, m_len, m_head,
       |         (media_id + 7) % (max_id + 1) AS doc_id, FALSE AS aligned
       |  FROM media, mx),
       |scored AS (
       |  SELECT p.aligned,
       |         p.m_len * c.t_len + p.m_head * c.t_head AS dot,
       |         p.m_len * p.m_len + p.m_head * p.m_head AS n1,
       |         c.t_len * c.t_len + c.t_head * c.t_head AS n2
       |  FROM pairs p JOIN caps c ON c.doc_id = p.doc_id),
       |s2 AS (
       |  SELECT aligned,
       |         CASE WHEN n1 > 0 AND n2 > 0 THEN
       |           CAST((dot::HUGEINT * 1000000)
       |                // (CAST(FLOOR(SQRT(CAST(n1 AS DOUBLE))) AS BIGINT)
       |                    * CAST(FLOOR(SQRT(CAST(n2 AS DOUBLE))) AS BIGINT))
       |                AS BIGINT)
       |         ELSE 0 END AS score_ppm
       |  FROM scored)
       |SELECT aligned, score_ppm >= ${AlignKeepPpm} AS kept,
       |       COUNT(*) AS n_pairs,
       |       CAST(SUM(score_ppm) // COUNT(*) AS BIGINT) AS avg_score_ppm
       |FROM s2 GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_text_align" -> textAlignSql,
    "mm_aspect_bucket" -> aspectBucketSql,
    "mm_decode_stub" -> decodeSql,
    "mm_decode_batched" -> decodeSql,
    "mm_metadata" ->
      """SELECT doc_id AS media_id,
        |       'text/plain' AS mime,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       lang AS lang_hint,
        |       CASE WHEN octet_length(encode(text)) >= 400 THEN 'large'
        |            WHEN octet_length(encode(text)) >= 200 THEN 'medium'
        |            ELSE 'small' END AS size_bucket
        |FROM documents""".stripMargin,
    "mm_content_dedup" ->
      // md5(varchar) hashes the utf8 bytes — identical to Spark's
      // md5(encode(text, 'UTF-8')) (portability proven by dedup_exact)
      """SELECT md5(text) AS digest,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       MIN(doc_id) AS canonical_id,
        |       COUNT(*) AS n_replicas
        |FROM documents
        |GROUP BY 1, 2""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |f AS (
        |  SELECT media_id, n_bytes,
        |         UNNEST(range(0, (n_bytes + 63) // 64)) AS frame_idx
        |  FROM m)
        |SELECT media_id, n_bytes, CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST(frame_idx * 64 AS BIGINT) AS frame_offset
        |FROM f WHERE frame_idx % 4 = 0""".stripMargin
  )
}
