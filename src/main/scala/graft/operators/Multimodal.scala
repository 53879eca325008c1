package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Decoded-feature schema produced by the stub decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("head_byte", LongType, nullable = false),
    StructField("byte_checksum", LongType, nullable = false),
    StructField("fake_feature", ArrayType(DoubleType), nullable = false)))

  /** STUB decoder: stands in for image/audio decode (libs absent in this
    * container). Deterministic pure function of the payload bytes; a real
    * deployment swaps `decodeOne` for the codec call — the batching,
    * schema, and partition layout stay identical.
    */
  private def decodeOne(id: Long, payload: Array[Byte]): Row = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = (checksum + (payload(i) & 0xff)) % 65536; i += 1 }
    val head = if (payload.isEmpty) 0L else (payload(0) & 0xff).toLong
    // fake 4-dim "embedding" from byte stats — placeholder for model output
    val feat = Array(
      payload.length.toDouble,
      head.toDouble,
      checksum.toDouble,
      (checksum % 7).toDouble)
    Row(id, payload.length.toLong, head, checksum, feat)
  }

  /** `mm_decode_stub`: batched per-partition decode over the binary column
    * (mapPartitions ≈ mapInPandas batch shape; no SQL oracle — stub features,
    * rows-only check + MultimodalSpec).
    */
  def mmDecodeStub(documents: DataFrame): DataFrame = {
    val media = mediaTable(documents)
    val spark = documents.sparkSession
    val rdd = media.select(col("media_id"), col("payload")).rdd.mapPartitions { it =>
      it.map(r => decodeOne(r.getLong(0), r.getAs[Array[Byte]](1)))
    }
    spark.createDataFrame(rdd, decodedSchema)
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

  val oracles: Map[String, String] = Map(
    "mm_metadata" ->
      """SELECT doc_id AS media_id,
        |       'text/plain' AS mime,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       lang AS lang_hint,
        |       CASE WHEN octet_length(encode(text)) >= 400 THEN 'large'
        |            WHEN octet_length(encode(text)) >= 200 THEN 'medium'
        |            ELSE 'small' END AS size_bucket
        |FROM documents""".stripMargin,
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
