package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** The Catalyst decode chain and the typed codec-boundary variant must agree
  * row-for-row — swapping a real codec into `mmDecodeBatched` keeps the same
  * schema/contract the driver-checked `mm_decode_stub` query declares.
  */
class MultimodalSpec extends SparkTestBase {

  test("mmDecodeStub (Catalyst) == mmDecodeBatched (typed mapPartitions)") {
    val docs = Tables.documents(spark, sf)
    val a = Multimodal.mmDecodeStub(docs).orderBy("media_id").collect()
    val b = Multimodal.mmDecodeBatched(docs).orderBy("media_id").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("mmDecodeStub schema is all-scalar (pandas-sortable)") {
    val df = Multimodal.mmDecodeStub(Tables.documents(spark, sf))
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType => ST}
    df.schema.fields.foreach { f =>
      assert(!f.dataType.isInstanceOf[ArrayType] && !f.dataType.isInstanceOf[MapType] &&
        !f.dataType.isInstanceOf[ST], s"non-scalar column ${f.name}")
    }
  }

  test("mmDecodeStub handles empty payload") {
    val empty = spark.range(1).select(
      col("id").as("doc_id"), lit("").as("text"), lit("en").as("lang"),
      lit(0L).as("quality"), lit("web").as("source"))
    val row = Multimodal.mmDecodeStub(empty).collect()(0)
    assert(row.getAs[Long]("n_bytes") == 0L)
    assert(row.getAs[Long]("head_byte") == 0L)
    assert(row.getAs[Long]("byte_checksum") == 0L)
  }

  test("checksum matches JVM byte sum on a known value") {
    val one = spark.range(1).select(
      col("id").as("doc_id"), lit("héllo").as("text"), lit("fr").as("lang"),
      lit(0L).as("quality"), lit("web").as("source"))
    val row = Multimodal.mmDecodeStub(one).collect()(0)
    val bytes = "héllo".getBytes("UTF-8")
    assert(row.getAs[Long]("n_bytes") == bytes.length.toLong)
    assert(row.getAs[Long]("head_byte") == (bytes(0) & 0xff).toLong)
    assert(row.getAs[Long]("byte_checksum") == bytes.map(_ & 0xff).map(_.toLong).sum % 65536)
  }

  test("mm_content_dedup collapses byte-identical payloads to the smallest id") {
    import spark.implicits._
    val df = Seq(
      (10L, "same bytes", "en", "s"),
      (3L, "same bytes", "en", "s"),
      (7L, "different", "en", "s"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.mmContentDedup(df).collect()
      .map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("n_replicas"))).toSet
    assert(out == Set((3L, 2L), (7L, 1L)))
  }

  test("mm_text_align: aligned pairs all kept, misaligned discriminated") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val rows = Multimodal.mmTextAlign(docs).collect()
      .map(r => (r.getAs[Boolean]("aligned"), r.getAs[Boolean]("kept")) ->
        r.getAs[Long]("n_pairs")).toMap
    // every media row appears once aligned and once misaligned
    assert(rows.collect { case ((true, _), c) => c }.sum == n)
    assert(rows.collect { case ((false, _), c) => c }.sum == n)
    // matched (media, caption) pairs describe the same object -> the stub
    // encoders agree and every aligned pair clears the threshold
    assert(rows.getOrElse((true, false), 0L) == 0L,
      s"aligned pairs were dropped: $rows")
    // the filter must actually reject a substantial share of mismatches
    val misKept = rows.getOrElse((false, true), 0L)
    val misDropped = rows.getOrElse((false, false), 0L)
    assert(misDropped > misKept,
      s"filter keeps most mismatched pairs: kept=$misKept dropped=$misDropped")
  }

  test("mm_text_align: non-ASCII captions use the first UTF-8 byte, not a codepoint") {
    import spark.implicits._
    // ADVICE r15: ascii('中') is -28 in Spark (signed first byte) but 20013 in
    // DuckDB (codepoint). t_head now decodes the byte from hex(encode(text)),
    // so a CJK-leading caption must read 0xE4 = 228 on the aligned pair and
    // the aligned pair must still clear the keep threshold (features equal).
    val docs = Seq((0L, "中文说明文字一段", "zh"), (1L, "plain ascii caption", "en"))
      .map { case (id, t, l) => (id, t, l, 0L, "web") }
      .toDF("doc_id", "text", "lang", "quality", "source")
    val rows = Multimodal.mmTextAlign(docs).collect()
      .map(r => (r.getAs[Boolean]("aligned"), r.getAs[Boolean]("kept")) ->
        r.getAs[Long]("n_pairs")).toMap
    assert(rows.getOrElse((true, false), 0L) == 0L,
      s"non-ASCII aligned pair dropped (byte/codepoint mismatch resurfaced): $rows")
    assert(rows.collect { case ((true, _), c) => c }.sum == 2L)
  }

  test("mm_aspect_bucket: assignment is the nearest-ratio bucket, JVM-checked") {
    val docs = Tables.documents(spark, sf)
    val ladder = Multimodal.AspectBuckets.map { case (w, h) => w * 1000000L / h }
    val rows = Multimodal.mmAspectBucket(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      assert(w >= 256 && w < 2049 && h >= 256 && h < 2049)
      val ratio = w * 1000000L / h
      assert(r.getAs[Long]("ratio_ppm") == ratio)
      // JVM argmin with the same smaller-index tie-break
      val best = ladder.zipWithIndex.minBy { case (p, i) => (math.abs(ratio - p), i) }._2
      assert(r.getAs[Long]("bucket_idx") == best.toLong,
        s"media ${r.getAs[Long]("media_id")}: ratio $ratio")
      assert(r.getAs[Long]("bucket_w") == Multimodal.AspectBuckets(best)._1)
      assert(r.getAs[Long]("bucket_h") == Multimodal.AspectBuckets(best)._2)
    }
  }

  test("mm_aspect_bucket: batches are dense per-bucket ordinals of size <= 32") {
    val out = Multimodal.mmAspectBucket(Tables.documents(spark, sf))
    val perBatch = out.groupBy("bucket_idx", "batch_idx")
      .agg(count(lit(1)).as("n")).collect()
    perBatch.foreach(r => assert(r.getAs[Long]("n") <= 32L))
    // batch ids are contiguous from 0 within each bucket, and every batch
    // but the last is full
    val byBucket = perBatch.groupBy(_.getAs[Long]("bucket_idx"))
    byBucket.foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("batch_idx")).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq)
      rows.sortBy(_.getAs[Long]("batch_idx")).dropRight(1)
        .foreach(r => assert(r.getAs[Long]("n") == 32L))
    }
  }
}
