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
}
