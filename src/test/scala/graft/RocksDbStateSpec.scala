package graft

import org.apache.spark.sql.functions._

/** The streaming endstates must be state-store-backend agnostic: the
  * default HDFS-backed provider keeps every live key in executor heap,
  * which at corpus scale caps state at the JVM; RocksDB (shipped with
  * Spark, `rocksdbjni`) keeps working state on local disk with a
  * block-cache, the documented choice for larger-than-memory streaming
  * state. docs/DEPLOY.md prescribes the provider for production
  * deployments; this spec pins what that prescription assumes — provider
  * choice changes WHERE state lives, never WHAT the query computes — by
  * running each stateful shape the library uses under both providers and
  * asserting identical results: flatMapGroupsWithState (sessionize),
  * watermarked windowed aggregation (daily counts),
  * dropDuplicatesWithinWatermark (dedup), stream-stream interval join,
  * and the upsert sink's keep-latest foreachBatch pipeline.
  */
class RocksDbStateSpec extends SparkTestBase {
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withProvider[T](cls: String)(f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, cls)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Order-insensitive exact content digest: (row count, sum of per-row
    * 64-bit hashes over the name-sorted columns).
    */
  private def digest(name: String): (Long, Any) = {
    val df = SparkEntry.queries(name)(spark, sf)
    val cols = df.columns.sorted.map(col)
    val row = df
      .select(sum(xxhash64(to_json(struct(cols: _*))).cast("decimal(30,0)")).as("h"),
        count(lit(1)).as("n"))
      .collect()(0)
    (row.getLong(1), row.get(0))
  }

  for (q <- Seq(
      "stream_sessionize_endstate",
      "stream_daily_counts_endstate",
      "stream_dedup_endstate",
      "stream_stream_join_endstate",
      "stream_upsert_endstate")) {
    test(s"$q: identical result under RocksDB and HDFS-backed state stores") {
      val base = digest(q)
      val rocks = withProvider(RocksDb)(digest(q))
      assert(base._1 > 0, s"$q produced no rows")
      assert(rocks === base,
        s"$q diverged across state-store providers: rocksdb=$rocks default=$base")
    }
  }
}
