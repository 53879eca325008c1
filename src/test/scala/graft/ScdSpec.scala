package graft

import java.sql.Timestamp
import graft.operators.{Aggregates, Scd}
import org.apache.spark.sql.functions._

/** Semantics gates for the type-2 SCD operators and the robust-stats
  * aggregates — the oracles prove engine-exactness on testdata; these prove
  * the intended behavior on crafted histories (change collapse, interval
  * chaining, merge case split, tie-breaks, MAD degeneracy).
  */
class ScdSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  private def events(rows: (Long, Int, Long, String)*) =
    rows.map { case (id, day, user, state) => (id, ts(day), user, state, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("scd2_build collapses runs, chains intervals, flags one current row") {
    // user 1: A A B A  -> versions A[1,5) B[5,9) A[9,∞); user 2: C -> C[2,∞)
    val df = events((10L, 1, 1L, "A"), (11L, 3, 1L, "A"), (12L, 5, 1L, "B"),
      (13L, 9, 1L, "A"), (20L, 2, 2L, "C"))
    val out = Scd.scd2Build(df).orderBy("user_id", "version").collect()
    assert(out.length == 4)
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("A", "B", "A"))
    assert(u1.map(_.getAs[Timestamp]("valid_from")).toSeq == Seq(ts(1), ts(5), ts(9)))
    assert(u1.map(_.getAs[Timestamp]("valid_to")).toSeq == Seq(ts(5), ts(9), null))
    assert(u1.map(_.getAs[Boolean]("is_current")).toSeq == Seq(false, false, true))
    // each open interval starts where the previous closed; exactly one current
    assert(out.count(_.getAs[Boolean]("is_current")) == 2)
  }

  test("scd2_build orders same-timestamp changes by event_id") {
    val df = events((2L, 1, 1L, "B"), (1L, 1, 1L, "A"))
    val out = Scd.scd2Build(df).orderBy("version").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("A", "B"))
  }

  test("scd2_merge: changed closes+opens, unchanged passes, new opens v1, absent untouched") {
    val df = events(
      (10L, 1, 1L, "A"), (11L, 25, 1L, "B"), (12L, 27, 1L, "C"), // changed: flap B→C collapses to C
      (20L, 2, 2L, "X"), (21L, 26, 2L, "X"),                     // unchanged end-state
      (30L, 25, 3L, "N"),                                        // new entity, post-cutoff only
      (40L, 3, 4L, "Z"))                                         // absent from the batch
    val out = Scd.scd2Merge(df, "2024-01-24").collect()
    val u1 = out.filter(_.getLong(0) == 1L).sortBy(_.getAs[Long]("version"))
    assert(u1.length == 2)
    assert(u1(0).getString(1) == "A" && !u1(0).getAs[Boolean]("is_current")
      && u1(0).getAs[Timestamp]("valid_to") == ts(27)) // closed at the FINAL batch state's ts
    assert(u1(1).getString(1) == "C" && u1(1).getAs[Boolean]("is_current")
      && u1(1).getAs[Long]("version") == 2L && u1(1).getAs[Timestamp]("valid_from") == ts(27))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getString(1) == "X" && u2.head.getAs[Boolean]("is_current"))
    val u3 = out.filter(_.getLong(0) == 3L)
    assert(u3.length == 1 && u3.head.getString(1) == "N"
      && u3.head.getAs[Long]("version") == 1L && u3.head.getAs[Timestamp]("valid_from") == ts(25))
    val u4 = out.filter(_.getLong(0) == 4L)
    assert(u4.length == 1 && u4.head.getString(1) == "Z" && u4.head.getAs[Boolean]("is_current"))
  }

  test("scd2_merge on testdata: exactly one current row per entity, intervals nested in bounds") {
    val df = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val out = Scd.scd2Merge(df).cache()
    val perUser = out.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("cur"))
    assert(perUser.where(col("cur") =!= 1).count() == 0)
    // closed intervals are well-formed
    assert(out.where(col("valid_to").isNotNull && col("valid_to") <= col("valid_from")).count() == 0)
    out.unpersist()
  }

  test("stream_scd2_endstate equals the batch scd2_merge exactly") {
    val sfDir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Scd2Sync.streamScd2Endstate(spark, sfDir)
    val batch = graft.operators.Scd.scd2Merge(
      graft.sources.Tables.events(spark, sfDir))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("scd2 sync repair restores a dim stranded mid-swap") {
    import java.nio.file.{Files, Paths}
    val root = "target/scd2_repair_test"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(root))
    val live = s"$root/dim"
    // simulate a crash between move-aside and move-in: only .old exists
    Files.createDirectories(Paths.get(live + ".old"))
    Files.write(Paths.get(live + ".old", "marker"), Array[Byte](1))
    graft.streaming.Scd2Sync.repair(live)
    assert(Files.exists(Paths.get(live, "marker")), "aside copy not restored")
    assert(!Files.exists(Paths.get(live + ".old")))
    // completed swap: live exists, stale aside must be dropped
    Files.createDirectories(Paths.get(live + ".old"))
    graft.streaming.Scd2Sync.repair(live)
    assert(Files.exists(Paths.get(live, "marker")) && !Files.exists(Paths.get(live + ".old")))
  }

  test("agg_mode picks the most frequent value, lexicographic tie-break") {
    val df = Seq(
      (1L, 1L, "F", 1.0, ts(1), "2-HIGH"), (2L, 1L, "F", 1.0, ts(1), "2-HIGH"),
      (3L, 1L, "F", 1.0, ts(1), "1-URGENT"),
      (4L, 2L, "F", 1.0, ts(1), "3-LOW"), (5L, 2L, "F", 1.0, ts(1), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val out = Aggregates.aggMode(df).orderBy("customer_id").collect()
    assert(out(0).getString(1) == "2-HIGH" && out(0).getLong(2) == 2L)
    assert(out(1).getString(1) == "1-URGENT" && out(1).getLong(2) == 1L) // tie → lexicographic
  }

  test("outlier_mad flags far points and survives the all-equal degeneracy") {
    val mk = (id: Long, tpe: String, v: Double) => (id, ts(1), 1L, tpe, v, "{}")
    val df = (Seq(mk(1L, "a", 10.0), mk(2L, "a", 11.0), mk(3L, "a", 9.0),
      mk(4L, "a", 10.5), mk(5L, "a", 500.0)) ++ // one far outlier
      Seq(mk(6L, "b", 7.0), mk(7L, "b", 7.0), mk(8L, "b", 7.0)))  // MAD = 0
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Aggregates.outlierMad(df).collect()
    assert(out.filter(_.getString(1) == "a").map(_.getLong(0)).toSet == Set(5L))
    assert(out.filter(_.getString(1) == "b").isEmpty) // all equal median, dev 0 > 0 false
  }
}
