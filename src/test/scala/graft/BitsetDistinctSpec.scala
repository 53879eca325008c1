package graft

import org.apache.spark.sql.functions._
import graft.functions.BitsetDistinct.bitset_distinct
import graft.sources.Tables

/** Guarantees of the dense-bitset exact-distinct aggregate: equality with
  * count(distinct) on the real corpus under any partitioning (exercising
  * serialize/merge), NULL skip, and the out-of-domain fail-fast.
  */
class BitsetDistinctSpec extends SparkTestBase {
  import spark.implicits._

  test("equals count(distinct) on the real corpus under any partitioning") {
    val events = Tables.events(spark, sf)
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 16)) {
      val got = events.repartition(parts).groupBy("event_type")
        .agg(bitset_distinct(col("user_id"), 1 << 16).as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exact, s"parts=$parts")
    }
  }

  test("NULLs are skipped; duplicates collapse; empty group counts zero") {
    val df = Seq(Some(3L), Some(3L), Some(7L), None, Some(0L))
      .toDF("v").repartition(4)
    val n = df.agg(bitset_distinct(col("v"), 64)).collect().head.getLong(0)
    assert(n == 3L)
    val empty = Seq.empty[Option[Long]].toDF("v")
      .agg(bitset_distinct(col("v"), 64)).collect().head.getLong(0)
    assert(empty == 0L)
  }

  test("integer-typed children count correctly (schema-matched extraction)") {
    // enum codes / dictionary ids arrive as INT — the advertised use case
    val ints = Seq(3, 3, 7, 0, 7).toDF("v")
    assert(ints.agg(bitset_distinct(col("v"), 64))
      .collect().head.getLong(0) == 3L)
    val shorts = Seq(1.toShort, 2.toShort, 1.toShort).toDF("v")
    assert(shorts.agg(bitset_distinct(col("v"), 64))
      .collect().head.getLong(0) == 2L)
  }

  test("non-integral children are rejected with a clear message") {
    val e = intercept[Exception] {
      Seq("a", "b").toDF("v").agg(bitset_distinct(col("v"), 64)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("requires an integral child"))))
  }

  test("out-of-domain value fails fast instead of undercounting") {
    val df = Seq(1L, 64L).toDF("v")
    val e = intercept[Exception] {
      df.agg(bitset_distinct(col("v"), 64)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage).exists(_.contains("outside configured domain"))))
  }
}
