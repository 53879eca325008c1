package graft

import org.apache.spark.sql.SparkSession

/** Scratch-sink roots for the operators that demonstrate a real write path
  * (text-format round trips, truncate loads, streaming drops/checkpoints).
  *
  * Resolution order makes the jar runnable from any CWD on any host:
  *   1. `spark.graft.scratch` — explicit override for tests / harnesses;
  *   2. `spark.local.dir` — Spark's own designated fast local disk(s); the
  *      right default on a cluster node (first entry when comma-separated);
  *   3. `java.io.tmpdir` — the JVM fallback.
  *
  * Paths are local-filesystem by contract: every user of a scratch sink
  * here is a single-process demo/verify query (the 100-TB story for real
  * sinks is the bucketed parquet + [[graft.streaming.ManifestStore]] commit
  * path, not a local directory).
  */
object Scratch {

  def root(spark: SparkSession): String = {
    val base = spark.conf.getOption("spark.graft.scratch")
      .orElse(spark.conf.getOption("spark.local.dir").map(_.split(",").head))
      .getOrElse(System.getProperty("java.io.tmpdir"))
    s"${base.stripSuffix("/")}/graft_scratch"
  }

  /** A named scratch leaf, e.g. `dir(spark, "csv_ingest")`. */
  def dir(spark: SparkSession, leaf: String): String = s"${root(spark)}/$leaf"
}
